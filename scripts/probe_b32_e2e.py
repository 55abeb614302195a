#!/usr/bin/env python
"""One-off probe: per-frame cost of the end-to-end generate program at B=32
with the streamed bb kernel vs the XLA W8A16 backbone.  Times max_new=125 vs
max_new=5 so prefill + tunnel dispatch + output transfer cancel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache

setup_cache(jax)

from csm_tpu.config import CSMConfig
from csm_tpu.generation import generate_compiled
from csm_tpu.models import csm
from csm_tpu.ops.fused_decoder import prepare_fused_decoder
from csm_tpu.ops.quant import prepare_quantized_backbone
from csm_tpu.ops.bb_kernel import prepare_streamed_backbone

config = CSMConfig()
B, S = 32, 64
rng = np.random.default_rng(0)
params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(jax.random.key(0))
np.asarray(params["projection"])
qdec = jax.jit(lambda p: prepare_fused_decoder(p, config, head_bits=8))(params)
qbb = jax.jit(lambda p: prepare_quantized_backbone(p, config))(params)
qsb = jax.jit(lambda p: prepare_streamed_backbone(p, config))(params)
np.asarray(qdec["s"]["wq"]); np.asarray(qbb["s"]["wqkv"]); np.asarray(qsb["final_norm"])

ids = np.zeros((B, S, config.frame_width), np.int32)
ids[..., -1] = rng.integers(1, config.text_vocab_size, (B, S))
mask = np.zeros((B, S, config.frame_width), np.float32)
mask[..., -1] = 1.0
ids, mask = jnp.asarray(ids), jnp.asarray(mask)


def run(n, use_qsb, greedy=False):
    frames, nf = generate_compiled(
        params, config, ids, mask, jnp.int32(S), jax.random.key(1),
        max_new_frames=n, temperature=1.0, topk=50, greedy=greedy,
        stop_on_all_zeros=False, stop_mode="stream",
        cache_len=256,  # pin the window so both n share one cache shape
        qdec=qdec, qbb=qbb, qsb=qsb if use_qsb else None,
    )
    return np.asarray(nf).sum()


stats = {}
# greedy=True zeroes the per-frame [32 codebooks, 32 streams, 2051] Gumbel
# table build — the sampled-vs-greedy per-frame delta isolates what noise
# generation + per-stream key splitting cost the e2e loop (round-4 verdict
# next-round #6: account for the bench-vs-ablation gap).
for label, use_qsb, greedy in (
    ("qsb kernel", True, False),
    ("qsb kernel GREEDY", True, True),
    ("XLA W8A16", False, False),
):
    for n in (5, 125):
        run(n, use_qsb, greedy)  # compile
    ts = {5: [], 125: []}
    for _ in range(3):
        for n in (5, 125):
            t0 = time.time()
            run(n, use_qsb, greedy)
            ts[n].append(time.time() - t0)
    t5 = min(ts[5]); t125 = min(ts[125])
    per = 1000.0 * (t125 - t5) / 120.0
    stats[label] = per
    print(f"{label}: t5={t5*1e3:.1f} ms  t125={t125*1e3:.1f} ms  "
          f"per-frame={per:.3f} ms  agg={B/per*1000:.0f} f/s", flush=True)

from _bench_lib import record_check  # noqa: E402

abl = 9.5669  # frame_ablation_B32_sb_h8 (kernels + glue, scan-amortized)
per = stats["qsb kernel"]
record_check(
    "b32_e2e_accounting", True, gated=False,
    e2e_frame_ms=float(per),
    greedy_frame_ms=float(stats["qsb kernel GREEDY"]),
    noise_build_ms=float(per - stats["qsb kernel GREEDY"]),
    ablation_frame_ms=abl,
    loop_overhead_ms=float(stats["qsb kernel GREEDY"] - abl),
)

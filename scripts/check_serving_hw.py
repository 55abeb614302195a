#!/usr/bin/env python
"""Hardware smoke of the continuous-batching server at 1B scale with all
quantized fast paths (fused decoder + streamed backbone): mid-flight
admission, a step_many chunk, and per-stream completion.  Random weights
— this drives the serving machinery (per-slot KV index vectors through
the bb kernel's vector-index scatter branch), not audio quality."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_csm")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder
    from csm_tpu.ops.quant import prepare_quantized_backbone
    from csm_tpu.serving import CSMServer

    config = CSMConfig()
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    # Past 8 slots the fused decoder chunks (a single B=16 program exceeds
    # the backend's scoped-VMEM limit); the int8 head halves each chunk's
    # per-step head-slice DMA.
    head_bits = 8 if n_slots > 8 else 16
    qdec = jax.jit(
        lambda p: prepare_fused_decoder(p, config, head_bits=head_bits)
    )(params)
    qbb = jax.jit(lambda p: prepare_quantized_backbone(p, config))(params)
    qsb = jax.jit(lambda p: prepare_streamed_backbone(p, config))(params)
    np.asarray(qsb["final_norm"])

    budget = 12
    server = CSMServer(
        params, config, n_slots=n_slots, window=256, greedy=False,
        stop_on_all_zeros=False, max_new_frames=budget,
        qdec=qdec, qbb=qbb, qsb=qsb,
    )

    rng = np.random.default_rng(0)

    def prompt(S, seed):
        ids = np.zeros((1, S, config.frame_width), np.int32)
        ids[..., -1] = np.random.default_rng(seed).integers(
            1, config.text_vocab_size, (1, S)
        )
        mask = np.zeros((1, S, config.frame_width), np.float32)
        mask[..., -1] = 1.0
        return jnp.asarray(ids), jnp.asarray(mask)

    t0 = time.time()
    # Shared voice-context prefix: later requests prefill only their
    # continuation against its cached K/V.
    pre_ids, pre_mask = prompt(32, seed=1000)
    pid = server.register_prefix(pre_ids, pre_mask)

    rids = []
    for i in range(n_slots):
        # Ragged prompt lengths, cycled so prompt + decode budget always
        # fits the 256-frame window at any slot count.
        ids, mask = prompt(16 + 8 * (i % 24), seed=i)
        # Exercise per-request sampling params on hardware: one greedy
        # request and one with its own temp/topk ride inside the sampled
        # batch (dynamic per-row vectors — no recompile); one request
        # rides the cached prefix.
        kw = {}
        if i == 1:
            kw = dict(greedy=True)
        elif i == 2:
            kw = dict(temperature=0.7, topk=10)
        elif i == 3:
            kw = dict(prefix_id=pid)
        rids.append(server.submit(ids, mask, rng=jax.random.key(50 + i), **kw))
    # a few single steps, then a late join mid-flight, then a chunk
    server.step()
    server.step()
    ids, mask = prompt(24, seed=99)
    late = server.submit(ids, mask, rng=jax.random.key(99))
    rids.append(late)
    while server.step_many(4):
        pass
    dt = time.time() - t0

    ok = True
    total = 0
    for rid in rids:
        frames = server.results.get(rid)
        good = (
            frames is not None
            and frames.shape == (budget, config.audio_num_codebooks)
            and frames.min() >= 0
            and frames.max() < config.audio_vocab_size
        )
        ok &= bool(good)
        total += 0 if frames is None else frames.shape[0]
        print(f"req {rid}: {'ok' if good else 'BAD'} "
              f"{None if frames is None else frames.shape}")
    print(f"served {len(rids)} requests / {total} frames in {dt:.1f}s "
          f"(n_slots={n_slots}, fused+streamed kernels)")
    from _bench_lib import record_check

    record_check(
        f"serving_n{n_slots}", ok, requests=len(rids), frames=total,
        wall_s=float(dt),
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

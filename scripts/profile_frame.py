#!/usr/bin/env python
"""Per-component timing of the single-stream frame step on the real chip.

Breaks the ~frame cost into: backbone decode step (bf16 vs W8A16 int8),
fused decoder kernel, XLA decoder, whole frame step — so optimization
targets the measured bottleneck, not a guess (ROADMAP "remaining headroom").

Methodology notes (this dev setup reaches the chip through a tunnel):

- params/quant bundles are passed as jit ARGUMENTS — closing over them bakes
  ~1 GB of constants into the HLO and the remote-compile request (HTTP 413);
- only a tiny output is synced per rep (dispatch+sync overhead is measured
  separately via a no-op program and subtracted);
- the steady-state number comes from the marginal cost of extra frames
  inside ONE compiled while_loop program — immune to dispatch overhead.

Run: python scripts/profile_frame.py [--reps 20] [--cache-len 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache, timed


def _qdec_max_b():
    from csm_tpu.ops.fused_decoder import MAX_CHUNKED_B

    return MAX_CHUNKED_B




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cache-len", type=int, default=256)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    setup_cache(jax)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.models.llama import KVCache
    from csm_tpu.generation import decode_frame, generate_compiled
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder, decode_frame_fused
    from csm_tpu.ops.quant import prepare_quantized_backbone

    config = CSMConfig()
    dtype = jnp.bfloat16
    params = jax.jit(lambda k: csm.init_params(k, config, dtype))(jax.random.key(0))
    np.asarray(params["projection"])
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, config))(params)
    qbb = jax.jit(lambda p: prepare_quantized_backbone(p, config))(params)
    np.asarray(qdec["s"]["wq"]); np.asarray(qbb["s"]["wqkv"])

    B, CL = args.batch, args.cache_len
    ids = jnp.zeros((B, 1, config.frame_width), jnp.int32)
    mask = jnp.ones((B, 1, config.frame_width), jnp.float32)
    cache = KVCache.create(config.backbone, B, CL, dtype=dtype)
    cache = cache.replace(
        index=jnp.int32(CL // 2),
        valid=cache.valid.at[:, : CL // 2].set(True),
    )

    # 0. dispatch+sync floor: a trivial program returning a tiny array
    noop = jax.jit(lambda x: x + 1.0)
    small = jnp.zeros((8,), jnp.float32)
    t_disp = timed(lambda: np.asarray(noop(small)), reps=args.reps)
    print(f"dispatch+sync floor        : {t_disp:8.3f} ms")

    # 1. backbone decode step: bf16 vs int8 (sync only last_h — 8 KB)
    @jax.jit
    def bb_step(p, c, q):
        out = csm.forward(p, config, ids, mask, cache=c, qbb=q)
        return out.last_hidden_state, out.logits

    t_bb_bf16 = timed(lambda: np.asarray(bb_step(params, cache, None)[0]), reps=args.reps)
    t_bb_int8 = timed(lambda: np.asarray(bb_step(params, cache, qbb)[0]), reps=args.reps)
    print(f"backbone decode step  bf16 : {t_bb_bf16:8.3f} ms   (-floor: {t_bb_bf16-t_disp:7.3f})")
    print(f"backbone decode step  int8 : {t_bb_int8:8.3f} ms   (-floor: {t_bb_int8-t_disp:7.3f})")

    last_h, c0_logits = bb_step(params, cache, qbb)
    np.asarray(last_h)
    key = jax.random.key(1)

    # 2. fused decoder kernel (incl. c0 sample + prefill-input build)
    @jax.jit
    def dff(p, q, lh, lg, k):
        return decode_frame_fused(p, q, config, lh, lg, k, 1.0, 50, False)

    t_dec_fused = timed(lambda: np.asarray(dff(params, qdec, last_h, c0_logits, key)), reps=args.reps)
    print(f"decode_frame fused         : {t_dec_fused:8.3f} ms   (-floor: {t_dec_fused-t_disp:7.3f})")

    # 3. XLA decoder path for comparison
    @jax.jit
    def dfx(p, lh, lg, k):
        return decode_frame(p, config, lh, lg, k, 1.0, 50, False, qdec=None)

    t_dec_xla = timed(lambda: np.asarray(dfx(params, last_h, c0_logits, key)), reps=args.reps)
    print(f"decode_frame XLA           : {t_dec_xla:8.3f} ms   (-floor: {t_dec_xla-t_disp:7.3f})")

    # 4. steady-state per-frame inside the real while_loop program
    S = 64
    pids = jnp.zeros((B, S, config.frame_width), jnp.int32)
    pmask = jnp.zeros((B, S, config.frame_width), jnp.float32).at[..., -1].set(1.0)

    def run(nf, k):
        frames, n = generate_compiled(
            params, config, pids, pmask, jnp.int32(S), k,
            max_new_frames=nf, temperature=1.0, topk=50, greedy=False,
            stop_on_all_zeros=False, stop_mode="stream",
            qdec=qdec if B <= _qdec_max_b() else None, qbb=qbb,
        )
        np.asarray(frames)

    nf_lo, nf_hi = 5, args.frames
    t_lo = timed(lambda: run(nf_lo, key), reps=max(3, args.reps // 3))
    t_hi = timed(lambda: run(nf_hi, key), reps=max(3, args.reps // 3))
    per_frame = (t_hi - t_lo) / (nf_hi - nf_lo)
    print(f"while_loop marginal /frame : {per_frame:8.3f} ms  "
          f"({B / per_frame * 1000.0:.1f} frames/s steady-state, B={B})")
    print(f"  vs parts (bb+dec-floor)  : {t_bb_int8 + t_dec_fused - 2 * t_disp:8.3f} ms")


if __name__ == "__main__":
    main()

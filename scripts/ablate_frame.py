#!/usr/bin/env python
"""In-program ablation of the frame step: times each stage by amortizing N
iterations inside ONE jitted lax.scan (the tunnel's ~25 ms dispatch makes
per-call timing useless).  Each scan body carries a data dependency so XLA
cannot hoist or elide iterations.

Stages: backbone decode step (int8) | fused decoder kernel | whole frame.
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




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cache-len", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--streamed", action="store_true",
                    help="route the backbone through the streamed-weight "
                    "kernel (qsb) instead of the W8A16 XLA path")
    ap.add_argument("--head-bits", type=int, default=16, choices=(8, 16),
                    help="fused-decoder audio_head precision (8 = int8 "
                    "head: single program up to B=16)")
    args = ap.parse_args()

    setup_cache(jax)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.models.llama import KVCache
    from csm_tpu.generation import decode_frame
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder
    from csm_tpu.ops.quant import prepare_quantized_backbone

    config = CSMConfig()
    B, CL, N_IT = args.batch, args.cache_len, args.iters
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(jax.random.key(0))
    qdec = jax.jit(
        lambda p: prepare_fused_decoder(p, config, head_bits=args.head_bits)
    )(params)
    qbb = jax.jit(lambda p: prepare_quantized_backbone(p, config))(params)
    np.asarray(qdec["s"]["wq"]); np.asarray(qbb["s"]["wqkv"])
    qsb = None
    if args.streamed:
        from csm_tpu.ops.bb_kernel import prepare_streamed_backbone

        qsb = jax.jit(lambda p: prepare_streamed_backbone(p, config))(params)
        np.asarray(qsb["final_norm"])

    mask = jnp.ones((B, 1, config.frame_width), jnp.float32)
    cache0 = KVCache.create(config.backbone, B, CL, dtype=jnp.bfloat16)
    cache0 = cache0.replace(
        index=jnp.int32(CL // 2), valid=cache0.valid.at[:, : CL // 2].set(True)
    )

    def measure(scan_fn, init, n, label):
        f = jax.jit(scan_fn, static_argnames=("n",))
        t_hi = timed(lambda: np.asarray(f(params, qbb, qdec, qsb, init, n=n)))
        t_lo = timed(lambda: np.asarray(f(params, qbb, qdec, qsb, init, n=5)))
        per = (t_hi - t_lo) / (n - 5)
        print(f"{label:28s}: {per:7.3f} ms/iter")
        return per

    # A. backbone decode step only (cache carried; samples fed from hidden)
    def scan_bb(p, qb, qd, qs, init, n):
        def body(carry, _):
            cache, ids = carry
            out = csm.forward(p, config, ids, mask, cache=cache, qbb=qb, qsb=qs)
            cache = out.cache.replace(index=jnp.int32(CL // 2))  # stay in window
            ids = ids.at[..., 0].set(
                (out.last_hidden_state[:, :1] > 0).astype(jnp.int32)[:, 0:1]
            )
            return (cache, ids), out.logits[0, 0]
        (cache, _), ls = jax.lax.scan(
            body, (init, jnp.zeros((B, 1, config.frame_width), jnp.int32)), None, length=n
        )
        return ls.sum()

    t_bb = measure(
        scan_bb, cache0, N_IT,
        "backbone step (streamed)" if args.streamed else "backbone step (int8)",
    )

    # B. fused decoder kernel only (x depends on previous samples)
    last_h0 = jnp.zeros((B, config.backbone.hidden_size), jnp.bfloat16)
    c0_logits0 = jnp.zeros((B, config.audio_vocab_size), jnp.float32)

    def scan_dec(p, qb, qd, qs, init, n):
        del init  # carry is built from the closed-over zeros below
        def body(carry, k):
            lh, lg = carry
            s = decode_frame(p, config, lh, lg, k, 1.0, 50, False, qdec=qd)
            lh = lh + s[:, :1].astype(lh.dtype)  # dependency
            lg = lg + s[:, 1:2].astype(lg.dtype)
            return (lh, lg), s[0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        (_, _), ss = jax.lax.scan(body, (last_h0, c0_logits0), keys)
        return ss.sum()

    t_dec = measure(scan_dec, None, N_IT, "fused decoder kernel")

    # C. whole frame step (bb + c0 sample + decoder + next inputs)
    from csm_tpu.generation import generate_frame, _next_frame_inputs

    def scan_frame(p, qb, qd, qs, init, n):
        def body(carry, k):
            cache, frame = carry
            ids, m = _next_frame_inputs(config, frame)
            out = generate_frame(p, config, ids, m, cache=cache, rng=k,
                                 qdec=qd, qbb=qb, qsb=qs)
            cache = out.cache.replace(index=jnp.int32(CL // 2))
            return (cache, out.samples), out.samples[0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        (_, _), ss = jax.lax.scan(
            body, (init, jnp.zeros((B, config.audio_num_codebooks), jnp.int32)), keys
        )
        return ss.sum()

    t_frame = measure(scan_frame, cache0, N_IT, "whole frame step")
    print(f"{'glue (frame - bb - dec)':28s}: {t_frame - t_bb - t_dec:7.3f} ms/iter")

    from _bench_lib import record_check

    # gated=False: this entry is a pure performance SNAPSHOT — there is no
    # correctness assertion behind its ok flag (unlike the check_*_hw
    # entries, whose ok is a real gate).
    record_check(
        f"frame_ablation_B{B}"
        + ("_sb" if args.streamed else "")
        + ("" if args.head_bits == 16 else f"_h{args.head_bits}"),
        True, gated=False,
        bb_ms=float(t_bb), dec_ms=float(t_dec), frame_ms=float(t_frame),
        agg_frames_per_s=float(B / t_frame * 1000.0),
    )


if __name__ == "__main__":
    main()

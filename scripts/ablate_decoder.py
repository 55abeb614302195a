#!/usr/bin/env python
"""Sub-ablation of the 2.6 ms decode_frame_fused path: kernel alone
(precomputed gumbel), greedy kernel, gumbel prep, c0 sample + x build."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache, timed




def main():
    setup_cache(jax)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops.fused_decoder import (
        decode_frame_fused, fused_decode_codebooks, prepare_fused_decoder,
    )

    config = CSMConfig()
    B, N_IT = 1, 40
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Dd = config.decoder.hidden_size
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(jax.random.key(0))
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, config))(params)
    np.asarray(qdec["s"]["wq"])

    def measure(scan_fn, n, label):
        f = jax.jit(scan_fn, static_argnames=("n",))
        t_hi = timed(lambda: np.asarray(f(params, qdec, n=n)))
        t_lo = timed(lambda: np.asarray(f(params, qdec, n=5)))
        per = (t_hi - t_lo) / (n - 5)
        print(f"{label:34s}: {per:7.3f} ms/iter")
        return per

    gumbel0 = jax.random.gumbel(jax.random.key(9), (N, B, Va), jnp.float32)
    x0 = jnp.zeros((B, Dd), jnp.float32)
    c0lg0 = jnp.zeros((B, Va), jnp.float32)

    # A. kernel alone, sampled (gumbel precomputed once)
    def scan_kernel(p, q, n):
        def body(carry, _):
            x, g = carry
            s = fused_decode_codebooks(
                q, config, x, c0lg0, g, 1.0, topk=50, greedy=False
            )
            x = x + s[0, 0].astype(jnp.float32)  # dependency
            g = g + s[0, 1].astype(jnp.float32) * 1e-9
            return (x, g), s[0, 0]
        (_, _), ss = jax.lax.scan(body, (x0, gumbel0), None, length=n)
        return ss.sum()

    t_k = measure(scan_kernel, N_IT, "kernel alone (sampled)")

    # B. kernel alone, greedy
    def scan_kernel_g(p, q, n):
        def body(carry, _):
            x = carry
            s = fused_decode_codebooks(
                q, config, x, c0lg0, jnp.zeros_like(gumbel0), 1.0,
                topk=50, greedy=True,
            )
            return x + s[0, 0].astype(jnp.float32), s[0, 0]
        _, ss = jax.lax.scan(body, x0, None, length=n)
        return ss.sum()

    t_kg = measure(scan_kernel_g, N_IT, "kernel alone (greedy)")

    # C. full decode_frame_fused (c0 sample + gumbel draws + x build + kernel)
    last_h0 = jnp.zeros((B, config.backbone.hidden_size), jnp.bfloat16)
    lg0 = jnp.zeros((B, Va), jnp.float32)

    def scan_full(p, q, n):
        def body(carry, k):
            lh, lg = carry
            s = decode_frame_fused(p, q, config, lh, lg, k, 1.0, 50, False)
            return (lh + s[:, :1].astype(lh.dtype), lg + s[:, 1:2].astype(lg.dtype)), s[0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        (_, _), ss = jax.lax.scan(body, (last_h0, lg0), keys)
        return ss.sum()

    t_f = measure(scan_full, N_IT, "decode_frame_fused (sampled)")

    # D. gumbel prep alone (the 31 vmapped draws)
    def scan_gumbel(p, q, n):
        def body(carry, k):
            keys = jax.random.split(k, N)
            g = jax.vmap(lambda kk: jax.random.gumbel(kk, (B, Va), jnp.float32))(keys[1:])
            return carry + g[0, 0, 0], g[0, 0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        _, ss = jax.lax.scan(body, jnp.float32(0), keys)
        return ss.sum()

    t_g = measure(scan_gumbel, N_IT, "gumbel draws alone")

    print(f"{'sampling overhead in-kernel':34s}: {t_k - t_kg:7.3f} ms/iter")
    print(f"{'wrapper (c0+x+gumbel) overhead':34s}: {t_f - t_k:7.3f} ms/iter")


if __name__ == "__main__":
    main()

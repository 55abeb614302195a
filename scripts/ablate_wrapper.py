#!/usr/bin/env python
"""Fine ablation of decode_frame_fused's ~0.5 ms non-kernel overhead."""

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
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder
    from csm_tpu.ops.sampling import sample_topk

    config = CSMConfig()
    B, N_IT = 1, 60
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Dd = config.decoder.hidden_size
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(jax.random.key(0))
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, config))(params)
    np.asarray(qdec["s"]["wq"])

    def measure(scan_fn, label, n=N_IT):
        f = jax.jit(scan_fn, static_argnames=("n",))
        t_hi = timed(lambda: np.asarray(f(params, qdec, n=n)))
        t_lo = timed(lambda: np.asarray(f(params, qdec, n=5)))
        per = (t_hi - t_lo) / (n - 5)
        print(f"{label:34s}: {per:7.3f} ms/iter")
        return per

    lg0 = jnp.zeros((B, Va), jnp.bfloat16).astype(jnp.float32)

    # 1. sample_topk (lax.top_k based) alone
    def scan_sample(p, q, n):
        def body(lg, k):
            s = sample_topk(k, lg, 50, 1.0, False)
            return lg + s[0].astype(jnp.float32) * 1e-9, s[0]
        keys = jax.random.split(jax.random.key(0), n)
        _, ss = jax.lax.scan(body, lg0, keys)
        return ss.sum()

    measure(scan_sample, "sample_topk (c0)")

    # 2. keys split + 31 gumbel draws
    def scan_gumbel(p, q, n):
        def body(c, k):
            keys = jax.random.split(k, N)
            g = jax.vmap(lambda kk: jax.random.gumbel(kk, (B, Va), jnp.float32))(keys[1:])
            return c + g[0, 0, 0], g[0, 0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        _, ss = jax.lax.scan(body, jnp.float32(0), keys)
        return ss.sum()

    measure(scan_gumbel, "split + gumbel draws")

    # 3. projection matmul + embed gather + stack
    lh0 = jnp.zeros((B, config.backbone.hidden_size), jnp.bfloat16)

    def scan_x(p, q, n):
        pe = q["proj_emb"].reshape(-1, Dd)
        def body(lh, k):
            c0 = jax.random.randint(k, (B,), 0, Va)
            x0 = lh @ p["projection"]
            x1 = pe[c0]
            x = jnp.stack([x0.astype(jnp.float32), x1.astype(jnp.float32)], 1)
            return lh + x[0, 0, 0].astype(lh.dtype) * 1e-9, x[0, 0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        _, ss = jax.lax.scan(body, lh0, keys)
        return ss.sum()

    measure(scan_x, "proj + embed gather + stack")

    # 4. gumbel pad to Va_pad
    g0 = jnp.zeros((N - 1, B, Va), jnp.float32)

    def scan_pad(p, q, n):
        Va_pad = -(-Va // 128) * 128
        def body(g, k):
            gp = jnp.pad(g, ((0, 0), (0, 0), (0, Va_pad - Va)))
            return g + gp[0, :, :Va] * 1e-9, gp[0, 0, 0]
        keys = jax.random.split(jax.random.key(0), n)
        _, ss = jax.lax.scan(body, g0, keys)
        return ss.sum()

    measure(scan_pad, "gumbel pad")


if __name__ == "__main__":
    main()

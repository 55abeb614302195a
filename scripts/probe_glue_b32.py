#!/usr/bin/env python
"""One-off probe: decompose the XLA-side glue around the two Pallas kernels
in the B=32 frame step.  The frame ablation shows the in-context backbone
step (``csm.forward`` -> ``forward_decode_streamed``) costs ~4.26 ms at B=32
while the isolated kernel scan (``check_bb_hw``) measures 3.02 ms — this
times each glue stage in its own amortized scan to find the gap:

  embed    — ``embed_frames`` on [B, 1, 33]
  ropebias — rope-table takes + validity-bias build
  scatter  — K/V rows scattered into the cache (scalar index)
  gumbel   — the per-frame [N, B, Va] noise table build (sampled mode)
  forward  — full ``forward_decode_streamed`` (= ablation's bb step)

Usage: python scripts/probe_glue_b32.py [--batch 32] [--iters 40]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache, timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cache-len", type=int, default=256)
    args = ap.parse_args()

    setup_cache(jax)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm, llama
    from csm_tpu.models.llama import KVCache
    from csm_tpu.ops.bb_kernel import prepare_streamed_backbone

    config = CSMConfig()
    B, CL, N_IT = args.batch, args.cache_len, args.iters
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    bcfg = config.backbone
    nkv, hd = bcfg.num_key_value_heads, bcfg.head_dim
    L = bcfg.num_hidden_layers

    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    qsb = jax.jit(lambda p: prepare_streamed_backbone(p, config))(params)
    np.asarray(qsb["final_norm"])

    ids = jnp.zeros((B, 1, config.frame_width), jnp.int32)
    mask = jnp.ones((B, 1, config.frame_width), jnp.float32)
    cache0 = KVCache.create(bcfg, B, CL, dtype=jnp.bfloat16)
    cache0 = cache0.replace(
        index=jnp.int32(CL // 2), valid=cache0.valid.at[:, : CL // 2].set(True)
    )

    def measure(scan_fn, n, label):
        f = jax.jit(scan_fn, static_argnames=("n",))
        t_hi = timed(lambda: np.asarray(f(params, qsb, cache0, ids, mask, n=n)))
        t_lo = timed(lambda: np.asarray(f(params, qsb, cache0, ids, mask, n=5)))
        per = (t_hi - t_lo) / (n - 5)
        print(f"{label:28s}: {per:7.3f} ms/iter", flush=True)
        return per

    # 1. embed_frames only
    def scan_embed(p, q, c, i, m, n):
        def body(carry, _):
            ii = carry
            h = csm.embed_frames(p, config, ii, m)[:, 0, :]
            ii = ii.at[..., 0].set((h[:, :1] > 0).astype(jnp.int32)[:, None, 0])
            return ii, h[0, 0]
        ii, hs = jax.lax.scan(body, i, None, length=n)
        return hs.sum()

    measure(scan_embed, N_IT, "embed_frames")

    # 2. rope takes + bias build
    rope = csm.compute_rope_table(bcfg, config.max_seq_len)

    def scan_ropebias(p, q, c, i, m, n):
        def body(carry, _):
            idx = carry
            starts = jnp.broadcast_to(idx.reshape(()), (B,))
            cos = jnp.take(rope[0], starts, axis=0, mode="clip")
            sin = jnp.take(rope[1], starts, axis=0, mode="clip")
            bias = jnp.where(c.valid, 0.0, llama.NEG_INF).astype(jnp.float32)
            dep = (cos.sum() + sin.sum() + bias[0, 0]).astype(jnp.int32)
            return idx + dep * 0, dep
        _, ds = jax.lax.scan(body, c.index, None, length=n)
        return ds.sum()

    measure(scan_ropebias, N_IT, "rope+bias")

    # 3. cache scatter at scalar index
    nk0 = jnp.zeros((L, B, 1, nkv, hd), jnp.bfloat16)

    def scan_scatter(p, q, c, i, m, n):
        def body(carry, _):
            k, v, idx = carry
            nk = nk0 + k[:, :, :1, :, :].mean()  # dependency
            k = jax.lax.dynamic_update_slice(k, nk, (0, 0, idx, 0, 0))
            v = jax.lax.dynamic_update_slice(v, nk, (0, 0, idx, 0, 0))
            one = jnp.ones((B, 1), jnp.bool_)
            del one
            return (k, v, idx), k[0, 0, 0, 0, 0]
        (_, _, _), ks = jax.lax.scan(body, (c.k, c.v, c.index), None, length=n)
        return ks.sum()

    measure(scan_scatter, N_IT, "kv scatter")

    # 4. gumbel table build (sampled, per-stream keys like serving)
    keys0 = jax.random.split(jax.random.key(0), B)

    def scan_gumbel(p, q, c, i, m, n):
        def body(carry, _):
            ks = carry
            keys_b = jax.vmap(lambda k: jax.random.split(k, N))(ks)
            gum = jax.vmap(
                jax.vmap(lambda k: jax.random.gumbel(k, (1, Va), jnp.float32)[0])
            )(keys_b)
            ks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(ks)
            return ks, gum[0, 0, 0]
        _, gs = jax.lax.scan(body, keys0, None, length=n)
        return gs.sum()

    measure(scan_gumbel, N_IT, "gumbel table [N,B,Va]")

    # 5. full forward_decode_streamed (ablation's backbone step)
    def scan_fwd(p, q, c, i, m, n):
        def body(carry, _):
            cache, ii = carry
            out = csm.forward(p, config, ii, m, cache=cache, qsb=q)
            cache = out.cache.replace(index=jnp.int32(CL // 2))
            ii = ii.at[..., 0].set(
                (out.last_hidden_state[:, :1] > 0).astype(jnp.int32)[:, 0:1]
            )
            return (cache, ii), out.logits[0, 0]
        (_, _), ls = jax.lax.scan(body, (c, i), None, length=n)
        return ls.sum()

    measure(scan_fwd, N_IT, "forward_decode_streamed")


if __name__ == "__main__":
    main()

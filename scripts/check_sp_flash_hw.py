#!/usr/bin/env python
"""Hardware check for the sequence-parallel flash path's kernel variant.

Multi-chip hardware is not available in this sandbox (one real TPU via the
tunnel), so this validates the piece of ``flash_attention_sp`` that is new
Mosaic territory — the ``q_offset`` kernel variant (dynamic diagonal via an
SMEM scalar; ``ops/flash_attention.py``) — by emulating the shards
SEQUENTIALLY on one chip at backbone scale:

- forward: each of 8 shards (S_local=256, q_offset = shard*256) against the
  full gathered K/V must reproduce the unsharded S=2048 kernel's slice
  BITWISE (same block_k-aligned key blocks in the same ascending order);
- backward: concatenated per-shard dq must match the full kernel's dq
  bitwise; summed per-shard dk/dv to fp tolerance (accumulation order);
- timing: per-shard fwd step time for the first and last shard (the last
  shard is the SPMD lockstep critical path).

The cross-shard collectives themselves (all_gather / psum_scatter under
shard_map) are validated functionally on the virtual 8-device CPU mesh
(tests/test_flash_attention.py::test_flash_attention_sp_shard_map_matches_full
and the trainer test); only the kernel needed real-Mosaic coverage.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import record_check, setup_cache


def main():
    setup_cache(jax)
    from csm_tpu.ops.flash_attention import flash_attention

    B, S, nq, nkv, hd = 1, 2048, 32, 8, 64
    n_sh = 8
    S_loc = S // n_sh
    bq, bk = 256, 512  # block_q = pick_block(S_loc), block_k = pick_block(S)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)) * 0.3, jnp.float32)
    valid = np.ones((B, S), np.int32)
    valid[0, :64] = 0  # left padding
    kv = jnp.asarray(valid)
    w = jnp.asarray(
        rng.standard_normal((B, S, nq, hd)) * valid[:, :, None, None],
        jnp.float32,
    )

    @jax.jit
    def full_fwd(q, k, v):
        return flash_attention(q, k, v, kv, causal=True, block_q=bq,
                               block_k=bk)

    # ONE compile serves every shard: q_offset is a traced scalar, exactly
    # as it is inside shard_map (axis_index * S_local).
    @jax.jit
    def shard_fwd(qs, k, v, off):
        return flash_attention(qs, k, v, kv, causal=True, block_q=bq,
                               block_k=bk, q_offset=off)

    t0 = time.time()
    full = np.asarray(full_fwd(q, k, v))
    print(f"full fwd compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = []
    for s in range(n_sh):
        qs = jax.lax.dynamic_slice_in_dim(q, s * S_loc, S_loc, axis=1)
        outs.append(np.asarray(shard_fwd(qs, k, v, jnp.int32(s * S_loc))))
    print(f"8 shard fwds compile+run: {time.time()-t0:.1f}s")
    sharded = np.concatenate(outs, axis=1)
    fwd_exact = bool((sharded == full).all())
    print(f"forward bitwise equal: {fwd_exact}")

    # Backward: one traced-offset grad program, run per shard.
    @jax.jit
    def full_grads(q, k, v):
        def loss(q, k, v):
            out = flash_attention(q, k, v, kv, causal=True, block_q=bq,
                                  block_k=bk)
            return jnp.sum(out * w)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @jax.jit
    def shard_grads(qs, k, v, off, ws):
        def loss(qs, k, v):
            out = flash_attention(qs, k, v, kv, causal=True, block_q=bq,
                                  block_k=bk, q_offset=off)
            return jnp.sum(out * ws)
        return jax.grad(loss, argnums=(0, 1, 2))(qs, k, v)

    t0 = time.time()
    gq_f, gk_f, gv_f = (np.asarray(g) for g in full_grads(q, k, v))
    print(f"full bwd compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    gqs, gk_s, gv_s = [], 0.0, 0.0
    for s in range(n_sh):
        qs = jax.lax.dynamic_slice_in_dim(q, s * S_loc, S_loc, axis=1)
        ws = jax.lax.dynamic_slice_in_dim(w, s * S_loc, S_loc, axis=1)
        dq, dk, dv = shard_grads(qs, k, v, jnp.int32(s * S_loc), ws)
        gqs.append(np.asarray(dq))
        gk_s = gk_s + np.asarray(dk)
        gv_s = gv_s + np.asarray(dv)
    print(f"8 shard bwds compile+run: {time.time()-t0:.1f}s")
    dq_exact = bool((np.concatenate(gqs, axis=1) == gq_f).all())
    rel_dk = float(np.abs(gk_s - gk_f).max() / max(np.abs(gk_f).max(), 1e-9))
    rel_dv = float(np.abs(gv_s - gv_f).max() / max(np.abs(gv_f).max(), 1e-9))
    print(f"dq bitwise equal: {dq_exact}; dk rel {rel_dk:.2e}, "
          f"dv rel {rel_dv:.2e}")
    # dk/dv: per-shard partials summed host-side here (psum_scatter on a
    # real mesh) — different order than the full kernel's query-block loop,
    # so fp tolerance, not bitwise.
    bwd_ok = dq_exact and rel_dk < 1e-5 and rel_dv < 1e-5

    # Per-shard forward step time: first vs last shard (the lockstep
    # critical path; earlier shards predicate most key blocks off).
    times = {}
    for s in (0, n_sh - 1):
        qs = jax.lax.dynamic_slice_in_dim(q, s * S_loc, S_loc, axis=1)
        off = jnp.int32(s * S_loc)
        shard_fwd(qs, k, v, off).block_until_ready()
        ts = []
        for _ in range(10):
            t0 = time.time()
            shard_fwd(qs, k, v, off).block_until_ready()
            ts.append(time.time() - t0)
        times[s] = sorted(ts)[len(ts) // 2] * 1000
        print(f"shard {s} fwd median: {times[s]:.3f} ms")

    ok = fwd_exact and bwd_ok
    record_check(
        "sp_flash_offset_S2048", ok,
        fwd_bitwise=fwd_exact, dq_bitwise=dq_exact,
        dk_rel=rel_dk, dv_rel=rel_dv,
        shard0_fwd_ms=times[0], shard7_fwd_ms=times[n_sh - 1],
    )
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

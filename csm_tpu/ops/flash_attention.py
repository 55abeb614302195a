"""Pallas TPU flash attention for the backbone prefill / training forward.

The naive attention path materializes fp32 scores ``[B, heads, S, T]`` —
537 MB at the 2048-frame max context — and streams them through HBM twice.
This kernel computes attention with online softmax in VMEM: scores never
leave the chip, HBM traffic is O(S·D) instead of O(S²).

Semantics match :func:`csm_tpu.models.llama._attention` exactly, including
the quirk the parity tests depend on: masking uses the **finite**
``NEG_INF`` bias, so a fully-masked query row (left-padding) softmaxes to
uniform attention over every key — identical to the XLA path and to HF's
min-dtype masking — rather than NaN.  GQA is expressed through the kv-head
``index_map`` (query head ``h`` reads kv head ``h // group``); no
``repeat_kv`` materialization.

**Causal block skipping**: fully-future key blocks do no work — their
compute is predicated off with ``pl.when`` and their ``k``/``v`` index maps
clamp to the diagonal block, which Mosaic's pipeline recognizes as a
revisit and skips the DMA.  (A lookup-table grid that enumerates only the
triangle was tried and is ~4× slower: dynamic block indices defeat the
pipeliner.)  For causal prefill this halves the work versus the full
square; the running max / denominator / output accumulator live in VMEM
scratch across the key blocks of each row (TPU grids execute sequentially).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # finite: fully-masked rows become uniform, not NaN


def _j_last(i, bq: int, bk: int, n_kb: int, causal: bool):
    """Index of the last key block row ``i`` must visit (the diagonal)."""
    if not causal:
        return n_kb - 1
    return jnp.minimum(((i + 1) * bq - 1) // bk, n_kb - 1)


def _flash_kernel(
    valid_ref,  # [1, 1, bk] int32 key validity
    q_ref,      # [1, g, bq, hd] — the WHOLE GQA group of this kv head
    k_ref,      # [1, 1, bk, hd]
    v_ref,      # [1, 1, bk, hd]
    o_ref,      # [1, g, bq, hd]
    m_scr,      # [g*bq, 128] f32 running max
    l_scr,      # [g*bq, 128] f32 running denominator
    acc_scr,    # [g*bq, hd] f32 output accumulator
    *,
    scale: float,
    g: int,
    bq: int,
    bk: int,
    n_kb: int,
    causal: bool,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    j_last = _j_last(i, bq, bk, n_kb, causal)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Strictly-future key blocks are skipped: no scores, no softmax update —
    # and their k/v index maps clamp to j_last, so no DMA happened either.
    @pl.when(j <= j_last)
    def _visit():
        # All g query heads of this kv group fold into the row axis: one
        # [g*bq, bk] matmul per block instead of g separate [bq, bk] ones —
        # better MXU shapes, 1/g the grid steps, k/v fetched once per group.
        q = q_ref[0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]  # [bk, hd]
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [g*bq, bk]

        row = jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 0)
        q_pos = i * bq + jax.lax.rem(row, bq)
        k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 1)
        ok = valid_ref[0, 0, :][None, :] > 0
        if causal:
            ok = ok & (k_pos <= q_pos)
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[:, :1]  # [g*bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [g*bq, bk]

        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == j_last)
    def _finalize():
        l = l_scr[:, :1]
        o = acc_scr[:] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = o.reshape(g, bq, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # [B, S, nq, hd]
    k: jnp.ndarray,  # [B, T, nkv, hd]
    v: jnp.ndarray,  # [B, T, nkv, hd]
    key_valid: Optional[jnp.ndarray] = None,  # [B, T] bool/int
    *,
    causal: bool = True,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention in the model's ``[B, S, heads, head_dim]`` layout.

    ``S`` and ``T`` must be multiples of the block sizes (callers pad to the
    prefill buckets, which are).  Queries are assumed to start at absolute
    position 0 (prefill / training).  Returns ``[B, S, nq, hd]`` in q's
    dtype.
    """
    B, S, nq, hd = q.shape
    T, nkv = k.shape[1], k.shape[2]
    assert S % block_q == 0 and T % block_k == 0, (S, T, block_q, block_k)
    g = nq // nkv
    n_qb = S // block_q
    n_kb = T // block_k
    scale = 1.0 / (hd ** 0.5)

    if key_valid is None:
        key_valid = jnp.ones((B, T), jnp.int32)
    # [B, 1, T]: the batch axis leads so the trailing block dims (1, bk)
    # satisfy Mosaic's tiling rule for any B (a (1, bk) block on a 2-D
    # [B, T] array is rejected when B > 1).
    key_valid = key_valid.astype(jnp.int32)[:, None, :]

    # Mosaic requires the trailing two block dims be (8, 128)-divisible or
    # full — so heads go up front: [B, heads, seq, hd].
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _flash_kernel, scale=scale, g=g, bq=block_q, bk=block_k, n_kb=n_kb,
        causal=causal,
    )

    def jc(i, j):
        # Clamp strictly-future key blocks to the diagonal: Mosaic sees a
        # revisited block index and elides the DMA for skipped iterations.
        return jnp.minimum(j, _j_last(i, block_q, block_k, n_kb, causal))

    grid = (B, nkv, n_qb, n_kb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, jc(i, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, block_q, hd), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd),
                         lambda b, h, i, j: (b, h, jc(i, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd),
                         lambda b, h, i, j: (b, h, jc(i, j), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, hd), lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq, S, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(key_valid, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)

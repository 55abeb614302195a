"""Pallas TPU flash attention (forward + backward) for the backbone
prefill / training paths.

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

**Backward pass** (``jax.custom_vjp``): the FlashAttention-2 recompute
scheme.  The forward additionally emits the per-row log-sum-exp; the
backward recomputes each score block from (q, k) and the saved LSE —
``p = exp(s − lse)`` — so the O(S²) probabilities are never stored.  Two
kernels: ``dq`` accumulates over key blocks with the forward's causal
skipping, and ``dk``/``dv`` accumulate over query blocks (skipping
strictly-past query blocks).  ``delta = rowsum(dO ∘ O)`` is a cheap XLA
reduction.  This makes attention memory O(S·D) in training too — the
reference trains through torch SDPA's memory-efficient kernel
(``/root/reference/modeling_csm.py:345-354``); this is the TPU equivalent.

LSE layout note: Mosaic tiles the trailing two block dims and cannot
shape-cast lanes into sublanes, so the kernels exchange LSE/delta as
``[B, nkv, g*S, 128]`` — rows ordered to match the kernels' GQA fold
(``row = i*g*bq + gi*bq + qi``), values replicated across the 128-lane
minor axis (the layout JAX's own TPU flash kernel uses for ``l``/``m``).
The saved residual is the lane-0 slice (compact, ``[B, nkv, g*S]``); the
backward re-broadcasts it.  The primal (non-grad) forward runs an
LSE-less kernel variant — Pallas outputs can't be DCE'd, and the
replicated LSE write would cost ~4× the attention output's own HBM bytes
on every inference call.

Dead rows (queries whose every key is masked — left padding): the forward
emits uniform attention over the visited keys (finite, garbage-by-contract,
masked out downstream); the backward zeroes their q/k/v gradients exactly.
This deliberately differs from the XLA path's dv (which spreads the dead
row's cotangent uniformly) — the training loss gives such rows zero
cotangent, where both paths agree; with a nonzero cotangent XLA's value is
equally arbitrary and count-inflation (see the dq kernel comment) would be
worse than zero.
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


def _j_last(i, bq: int, bk: int, n_kb: int, causal: bool, q_off=0):
    """Index of the last key block row ``i`` must visit (the diagonal).

    ``q_off`` is the absolute position of local query row 0 — 0 for
    plain prefill/training, ``shard_index * S_local`` under sequence
    parallelism (then a traced scalar, making the bound dynamic)."""
    if not causal:
        return n_kb - 1
    return jnp.minimum((q_off + (i + 1) * bq - 1) // bk, n_kb - 1)


def _i_first(j, bq: int, bk: int, causal: bool, q_off=0):
    """Index of the first query block that can see key block ``j``."""
    if not causal:
        return 0
    return jnp.maximum(0, (j * bk - q_off) // bq)


def _block_mask(i, j, valid_row, g: int, bq: int, bk: int, causal: bool,
                q_off=0):
    """``[g*bq, bk]`` bool mask for score block (i, j): key validity and
    (optionally) causality.  ``valid_row``: ``[bk]`` int key validity.
    ``q_off``: absolute position of local query row 0 (see ``_j_last``)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 0)
    q_pos = q_off + i * bq + jax.lax.rem(row, bq)
    k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 1)
    ok = valid_row[None, :] > 0
    if causal:
        ok = ok & (k_pos <= q_pos)
    return ok


def _flash_kernel(
    *refs,      # [off_ref (1,) SMEM if with_offset,] valid_ref [1,1,bk],
                # q_ref [1,g,bq,hd] (the WHOLE GQA group of this kv head),
                # k_ref [1,1,bk,hd], v_ref [1,1,bk,hd], o_ref [1,g,bq,hd],
                # [lse_ref [1,1,g*bq,128] if with_lse,] m_scr, l_scr, acc_scr
    scale: float,
    g: int,
    bq: int,
    bk: int,
    n_kb: int,
    causal: bool,
    with_lse: bool,
    with_offset: bool,
):
    if with_offset:
        off_ref, refs = refs[0], refs[1:]
        q_off = off_ref[0]
    else:
        q_off = 0
    valid_ref, q_ref, k_ref, v_ref, o_ref, *rest = refs
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    i = pl.program_id(2)
    j = pl.program_id(3)
    j_last = _j_last(i, bq, bk, n_kb, causal, q_off)

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

        ok = _block_mask(i, j, valid_ref[0, 0, :], g, bq, bk, causal, q_off)
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
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o = acc_scr[:] / l_safe
        o_ref[0] = o.reshape(g, bq, o_ref.shape[-1]).astype(o_ref.dtype)
        if with_lse:
            # Dead rows (m == NEG_INF): fp32 at 1e9 has ulp 64, so
            # m + log(l) rounds back to exactly NEG_INF — the backward
            # detects `lse <= NEG_INF/2` and zeroes those rows' grads.
            lse = m_scr[:, :1] + jnp.log(l_safe)  # [g*bq, 1]
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_fwd_call(
    q: jnp.ndarray,  # [B, S, nq, hd]
    k: jnp.ndarray,  # [B, T, nkv, hd]
    v: jnp.ndarray,  # [B, T, nkv, hd]
    key_valid: jnp.ndarray,  # [B, T] int32
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
    with_lse: bool = False,
    q_offset: Optional[jnp.ndarray] = None,  # scalar int32
):
    """Run the forward kernel.

    Returns ``(out [B,S,nq,hd], lse [B,nkv,g*S] | None)``.  The LSE output
    (needed only by the backward) is omitted from the primal kernel —
    Pallas outputs can't be DCE'd by XLA, and the lane-replicated LSE
    write would cost ~4× the attention output's own HBM bytes on every
    inference/eval call.

    ``q_offset`` (sequence parallelism): the absolute position of query
    row 0, a traced scalar.  Causality then bounds against
    ``q_offset + s``.  The dynamic diagonal still PREDICATES the compute
    (``pl.when`` on a bound read from SMEM) but cannot clamp the index
    maps (they see only grid indices), so future blocks' K/V DMAs are not
    elided.  That costs nothing in SPMD wall-clock: the lockstep critical
    path is the LAST shard, whose causal triangle spans every key block
    anyway; earlier shards merely fetch blocks they then skip."""
    B, S, nq, hd = q.shape
    T, nkv = k.shape[1], k.shape[2]
    assert S % block_q == 0 and T % block_k == 0, (S, T, block_q, block_k)
    g = nq // nkv
    n_qb = S // block_q
    n_kb = T // block_k
    scale = 1.0 / (hd ** 0.5)
    with_offset = q_offset is not None

    # [B, 1, T]: the batch axis leads so the trailing block dims (1, bk)
    # satisfy Mosaic's tiling rule for any B (a (1, bk) block on a 2-D
    # [B, T] array is rejected when B > 1).
    valid3 = key_valid.astype(jnp.int32)[:, None, :]

    # Mosaic requires the trailing two block dims be (8, 128)-divisible or
    # full — so heads go up front: [B, heads, seq, hd].
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _flash_kernel, scale=scale, g=g, bq=block_q, bk=block_k, n_kb=n_kb,
        causal=causal, with_lse=with_lse, with_offset=with_offset,
    )

    def jc(i, j):
        # Clamp strictly-future key blocks to the diagonal: Mosaic sees a
        # revisited block index and elides the DMA for skipped iterations.
        # With a dynamic q_offset the diagonal is unknown to the index map
        # — leave j unclamped (see the q_offset note above).
        if with_offset:
            return j
        return jnp.minimum(j, _j_last(i, block_q, block_k, n_kb, causal))

    grid = (B, nkv, n_qb, n_kb)
    in_specs = [
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
    ]
    call_args = [valid3, qt, kt, vt]
    if with_offset:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        call_args.insert(0, jnp.asarray(q_offset, jnp.int32).reshape(1))
    out_specs = [
        pl.BlockSpec((1, g, block_q, hd), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, nq, S, hd), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, 1, g * block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((B, nkv, g * S, 128), jnp.float32)
        )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*call_args)
    if with_lse:
        out, lse = res
        # Compact the lane-replicated LSE for the residual (the backward
        # re-broadcasts; 128× less residual memory when remat is off).
        return out.transpose(0, 2, 1, 3), lse[..., 0]
    return res[0].transpose(0, 2, 1, 3), None


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    *refs,      # [off_ref (1,) SMEM if with_offset,] valid_ref [1,1,bk],
                # q_ref [1,g,bq,hd], k_ref [1,1,bk,hd], v_ref [1,1,bk,hd],
                # do_ref [1,g,bq,hd], lse_ref / delta_ref [1,1,g*bq,128]
                # (lane-replicated), dq_ref [1,g,bq,hd] out,
                # dq_scr [g*bq,hd] f32
    scale: float,
    g: int,
    bq: int,
    bk: int,
    n_kb: int,
    causal: bool,
    with_offset: bool,
):
    if with_offset:
        off_ref, refs = refs[0], refs[1:]
        q_off = off_ref[0]
    else:
        q_off = 0
    (valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
     dq_ref, dq_scr) = refs
    i = pl.program_id(2)
    j = pl.program_id(3)
    j_last = _j_last(i, bq, bk, n_kb, causal, q_off)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(j <= j_last)
    def _visit():
        hd = q_ref.shape[-1]
        q = q_ref[0].reshape(g * bq, hd)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0].reshape(g * bq, hd)
        lse = lse_ref[0, 0, :, :1]  # [g*bq, 1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        ok = _block_mask(i, j, valid_ref[0, 0, :], g, bq, bk, causal, q_off)
        s = jnp.where(ok, s, NEG_INF)
        # Dead rows (every key masked → lse ≈ NEG_INF): exp(s − lse) would
        # be 1 per visited key, count-inflating their grads (fp32 rounding
        # at 1e9 destroys the log-count term).  Zero them instead — their
        # forward output is garbage-by-contract and the training loss
        # gives them zero cotangent; this just makes the zero exact.
        p = jnp.where(lse <= NEG_INF / 2, 0.0, jnp.exp(s - lse))

        dp = jax.lax.dot_general(  # dO · Vᵀ
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == j_last)
    def _finalize():
        dq_ref[0] = dq_scr[:].reshape(g, bq, dq_ref.shape[-1]).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    *refs,      # [off_ref (1,) SMEM if with_offset,] valid_ref [1,1,bk],
                # q_ref [1,g,bq,hd], k_ref [1,1,bk,hd], v_ref [1,1,bk,hd],
                # do_ref [1,g,bq,hd], lse_ref / delta_ref [1,1,g*bq,128]
                # (lane-replicated), dk_ref / dv_ref [1,1,bk,hd] out,
                # dk_scr / dv_scr [bk,hd] f32
    scale: float,
    g: int,
    bq: int,
    bk: int,
    n_qb: int,
    causal: bool,
    with_offset: bool,
):
    if with_offset:
        off_ref, refs = refs[0], refs[1:]
        q_off = off_ref[0]
    else:
        q_off = 0
    (valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
     dk_ref, dv_ref, dk_scr, dv_scr) = refs
    j = pl.program_id(2)
    i = pl.program_id(3)
    i_first = _i_first(j, bq, bk, causal, q_off)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # Query blocks strictly before the diagonal cannot see key block j —
    # their index maps clamp to i_first, so the DMA is elided too.
    @pl.when(i >= i_first)
    def _visit():
        hd = q_ref.shape[-1]
        q = q_ref[0].reshape(g * bq, hd)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0].reshape(g * bq, hd)
        lse = lse_ref[0, 0, :, :1]  # [g*bq, 1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        ok = _block_mask(i, j, valid_ref[0, 0, :], g, bq, bk, causal, q_off)
        s = jnp.where(ok, s, NEG_INF)
        # Dead-row zeroing — see the dq kernel for the rationale.
        p = jnp.where(lse <= NEG_INF / 2, 0.0, jnp.exp(s - lse))

        # dV = Pᵀ · dO — the GQA group's g heads fold into the row axis, so
        # one dot also performs the sum over the group.
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(  # dSᵀ · Q
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(i == n_qb - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_call(
    q, k, v, key_valid, out, lse, dout,
    causal: bool, block_q: int, block_k: int, interpret: bool,
    q_offset: Optional[jnp.ndarray] = None,
):
    B, S, nq, hd = q.shape
    T, nkv = k.shape[1], k.shape[2]
    g = nq // nkv
    n_qb = S // block_q
    n_kb = T // block_k
    scale = 1.0 / (hd ** 0.5)
    with_offset = q_offset is not None
    off_arg = (
        [jnp.asarray(q_offset, jnp.int32).reshape(1)] if with_offset else []
    )
    off_spec = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] if with_offset else []
    )

    valid3 = key_valid.astype(jnp.int32)[:, None, :]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = dout.transpose(0, 2, 1, 3)
    out_t = out.transpose(0, 2, 1, 3)

    # delta = rowsum(dO ∘ O): cheap O(S·D) XLA reduction, laid out like lse —
    # flat rows ordered (q_block, group_head, row) to match the kernels' GQA
    # fold, lane-replicated to 128 (see module docstring).
    delta = jnp.sum(
        dot.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-1
    )  # [B, nq, S]
    delta = (
        delta.reshape(B, nkv, g, n_qb, block_q)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, nkv, g * S)
    )
    delta = jnp.broadcast_to(delta[..., None], (B, nkv, g * S, 128))
    lse = jnp.broadcast_to(lse[..., None], (B, nkv, g * S, 128))

    def jc(i, j):
        if with_offset:  # dynamic diagonal — index maps can't clamp it
            return j
        return jnp.minimum(j, _j_last(i, block_q, block_k, n_kb, causal))

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, g=g, bq=block_q, bk=block_k,
        n_kb=n_kb, causal=causal, with_offset=with_offset,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, nkv, n_qb, n_kb),
        in_specs=off_spec + [
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
            pl.BlockSpec((1, g, block_q, hd), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, hd),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq, S, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((g * block_q, hd), jnp.float32)],
        interpret=interpret,
    )(*off_arg, valid3, qt, kt, vt, dot, lse, delta)

    def ic(j, i):
        if with_offset:  # dynamic diagonal — index maps can't clamp it
            return i
        return jnp.maximum(i, _i_first(j, block_q, block_k, causal))

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, g=g, bq=block_q, bk=block_k,
        n_qb=n_qb, causal=causal, with_offset=with_offset,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, nkv, n_kb, n_qb),
        in_specs=off_spec + [
            pl.BlockSpec((1, 1, block_k), lambda b, h, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, block_q, hd),
                         lambda b, h, j, i: (b, h, ic(j, i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, block_q, hd),
                         lambda b, h, j, i: (b, h, ic(j, i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * block_q, 128),
                         lambda b, h, j, i: (b, h, ic(j, i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * block_q, 128),
                         lambda b, h, j, i: (b, h, ic(j, i), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nkv, T, hd), k.dtype),
            jax.ShapeDtypeStruct((B, nkv, T, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, hd), jnp.float32),
            pltpu.VMEM((block_k, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*off_arg, valid3, qt, kt, vt, dot, lse, delta)

    return dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3), dv.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# custom_vjp assembly
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, key_valid, q_offset, causal, block_q, block_k, interpret):
    out, _ = _flash_fwd_call(q, k, v, key_valid, causal, block_q, block_k,
                             interpret, with_lse=False, q_offset=q_offset)
    return out


def _flash_vjp_fwd(q, k, v, key_valid, q_offset, causal, block_q, block_k,
                   interpret):
    out, lse = _flash_fwd_call(q, k, v, key_valid, causal, block_q, block_k,
                               interpret, with_lse=True, q_offset=q_offset)
    return out, (q, k, v, key_valid, q_offset, out, lse)


def _flash_vjp_bwd(causal, block_q, block_k, interpret, res, dout):
    q, k, v, key_valid, q_offset, out, lse = res
    dq, dk, dv = _flash_bwd_call(
        q, k, v, key_valid, out, lse, dout, causal, block_q, block_k,
        interpret, q_offset=q_offset,
    )
    # key_valid / q_offset are integer data: their cotangent is float0
    # (or None when the offset wasn't supplied).
    dvalid = np.zeros(key_valid.shape, jax.dtypes.float0)
    doff = (
        None if q_offset is None
        else np.zeros(jnp.shape(q_offset), jax.dtypes.float0)
    )
    return dq, dk, dv, dvalid, doff


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


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
    q_offset: Optional[jnp.ndarray] = None,  # scalar int32
) -> jnp.ndarray:
    """Flash attention in the model's ``[B, S, heads, head_dim]`` layout.

    ``S`` and ``T`` must be multiples of the block sizes (callers pad to the
    prefill buckets, which are).  Queries start at absolute position
    ``q_offset`` (default 0 — prefill / training; sequence-parallel shards
    pass ``shard_index * S_local``, a traced scalar).  Returns
    ``[B, S, nq, hd]`` in q's dtype.  Differentiable in (q, k, v) via the
    Pallas backward kernels.
    """
    B, S, nq, hd = q.shape
    T = k.shape[1]
    if key_valid is None:
        key_valid = jnp.ones((B, T), jnp.int32)
    if q_offset is not None:
        assert causal, "q_offset only makes sense for causal attention"
    return _flash(
        q, k, v, key_valid.astype(jnp.int32), q_offset, causal, block_q,
        block_k, interpret,
    )


def flash_attention_sp(
    q: jnp.ndarray,  # [B, S_local, nq, hd] — this shard's query slice
    k: jnp.ndarray,  # [B, S_local, nkv, hd]
    v: jnp.ndarray,  # [B, S_local, nkv, hd]
    key_valid: Optional[jnp.ndarray] = None,  # [B, S_local] bool/int
    *,
    axis_name: str = "seq",
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal flash attention over a sequence-sharded axis (call INSIDE
    ``jax.shard_map``; ``axis_name`` is the mesh axis the frame dimension is
    sharded over).

    Sequence parallelism for causal attention in ONE kernel call per shard:
    all-gather K/V (cheap — O(S·D), the thing SP shards is the O(S²) score
    work and the query-side activations), then run the causal kernel with
    ``q_offset = shard_index * S_local``.  Because causality is evaluated at
    GLOBAL positions against the same ``block_k``-aligned key blocks in the
    same ascending order, every query row performs bit-identical online-
    softmax updates to the unsharded kernel — the forward matches
    :func:`flash_attention` on the gathered inputs exactly, with no
    LSE-merge pass.  The backward differentiates through the all-gather
    (its transpose is a ``psum_scatter``, so each shard's partial dK/dV
    reduce back to the owner); dK/dV sum across shards in a different
    order than the unsharded kernel's query-block loop — last-ulp fp
    differences only.

    Per-shard work is bounded by the LAST shard's causal triangle (the
    SPMD lockstep critical path), which spans every key block — so the
    unclammed index maps (future-block DMAs not elided; see
    ``_flash_fwd_call``) cost no wall-clock.

    Replaces the two-call LSE-merge design sketched in ROADMAP round 4:
    same collective traffic, one kernel launch instead of two, and no
    gradient path through a merged LSE to maintain.
    """
    S_local = q.shape[1]
    if key_valid is None:
        key_valid = jnp.ones(q.shape[:2], jnp.int32)
    idx = jax.lax.axis_index(axis_name)
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    valid_full = jax.lax.all_gather(
        key_valid.astype(jnp.int32), axis_name, axis=1, tiled=True
    )
    q_offset = (idx * S_local).astype(jnp.int32)
    return flash_attention(
        q, k_full, v_full, valid_full, causal=True, block_q=block_q,
        block_k=block_k, interpret=interpret, q_offset=q_offset,
    )

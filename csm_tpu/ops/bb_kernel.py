"""Streamed-weight Pallas kernel for the backbone decode step.

Why.  After the fused intra-frame decoder kernel, the largest per-frame cost
is the backbone's single-token decode step: 16 layers re-read ~0.95 GB of
int8 weights from HBM (reference loop: ``/root/reference/modeling_csm.py:
640-659``; our XLA path: :func:`csm_tpu.models.llama.forward` with
``qlayers``).  The XLA path issues ~70 separate ops whose scheduling gaps
keep the DMA engine idle between matmuls.  This kernel runs the ENTIRE
decode step — 16 transformer layers, KV-cache attention, final norm, and the
``codebook0_head`` classification — as one Pallas program that streams the
int8 weights chunk-by-chunk through a small VMEM ring with the next chunk's
DMA always in flight, pinning the step to the HBM-bandwidth floor
(~0.95 GB / 819 GB/s ≈ 1.2 ms on a v5e).

Design (see also :mod:`csm_tpu.ops.fused_decoder`, which this mirrors):

- weights are **int8 symmetric per-output-channel** with the RMSNorm weights
  folded into the pre-norm matrices (the per-row ``rsqrt(mean(x²)+eps)``
  scalar applies to matmul outputs, so the norm reduce overlaps the dot);
- a static chunk schedule (per layer: qkv → wo → gate-up column chunks →
  down row chunks; then the head) runs through two VMEM rings (~8.4
  MB/chunk) via async DMA; compute waits on the chunk semaphore, consumes,
  and immediately issues the fetch that reuses the slot;
- **no vector shape casts anywhere** — Mosaic's layout inference rejects the
  32-head reshapes a conventional attention would need ("unsupported shape
  cast"), so every head split/merge is an exact one-hot matmul (the MXU
  does the data movement; one-hot f32 dots are bit-exact) and RoPE runs on
  the flat lane layout: the Q/K projection columns are permuted at PREPARE
  time into [all first halves | all second halves] order, which turns
  rotate-half into a single 2-D concat;
- attention is block-diagonal merged GQA over the biased window — two big
  dots for ALL streams and heads (:func:`_attend_flat`);
- the KV window is DMA'd per layer, double-buffered; the NEW token's K/V
  ride in an extra window row, so the kernel never writes the HBM cache —
  the new rows are regular outputs the XLA caller scatters (kernel stays
  pure);
- ``codebook0_head`` is folded with the final norm and classified in-kernel;
  outputs are the final-normed hidden (for the decoder-stage projection)
  and the c0 logits.

Numerics: residual stream fp32, matmuls W8A16 (bf16 activations × int8
weights, fp32 accumulation — no activation quantization error), softmax
fp32, attention operands bf16 (as in the XLA path), c0 logits rounded
through bf16 (the XLA head matmul emits bf16).  Opt-in like the other
quantized paths; exactness contract is against
:func:`emulate_bb_decode_step`, a pure-JAX op-for-op replica (same chunked
partial sums, same one-hot movements, same casts) used as the test oracle.
Both sides must run under jit when compared (XLA's FMA contraction differs
between jitted and eager programs).
"""

from __future__ import annotations

import os
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csm_tpu.config import CSMConfig
from csm_tpu.ops.fused_decoder import (
    NEG_INF, _rms_scale, bf16_round, quantize_per_channel,
)

# Ring-A chunk columns / ring-B chunk rows (int8; 4.2 MB at 2048).  Finer
# chunks pipeline better: measured 1B/B=1 ms/step — 4096: 1.355, 2048:
# 1.324, 1024: 1.323 (plateau).  Trace-time knob like CSM_BB_RING_DEPTH.
CHUNK_N = int(os.environ.get("CSM_BB_CHUNK_N", "2048"))

# Largest batch the kernel is hardware-validated for (scripts/check_bb_hw.py
# + KERNEL_CHECKS.json); csm.forward falls back to the XLA paths above this.
# The step streams the same weight bytes regardless of B, so batch rows are
# near-free: measured W8A16 at W=256 — B=1: 1.34 ms/step, B=16: 1.67 ms
# (16 streams for +25% time; the B²-scaling block-diagonal attention
# temporaries and the extra f32 sublane tiles cost the difference).
# B=32 rides the 8-stream-grouped attention (_attend_flat) to stay inside
# the scoped-VMEM budget: 3.02 ms/step, still ~1.5 ms under the XLA int8
# path at that batch.
MAX_VALIDATED_B = 32
# Hardware-validated batch cap for the EXACT bf16 tier (bits=16): the ring
# entries double in size (bf16), so the VMEM budget differs from int8 —
# validated separately (scripts/check_bb_hw.py <B> <W> 16; KERNEL_CHECKS
# bb_kernel_B*_exact: B=1 2.78 ms/step 86% HBM util, B=8 2.84 ms).
MAX_VALIDATED_B_EXACT = 8


# ---------------------------------------------------------------------------
# Preparation
# ---------------------------------------------------------------------------


def _half_perm(H: int, hd: int) -> np.ndarray:
    """Column permutation putting ``H`` heads' rotary halves into
    [all first halves | all second halves] order (head-major in each block).
    ``perm[new] = old`` — apply as ``w[:, perm]``."""
    half = hd // 2
    first = np.arange(H)[:, None] * hd + np.arange(half)[None, :]
    second = first + half
    return np.concatenate([first.reshape(-1), second.reshape(-1)])


def pack_int4_rows(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int nibble values ``[-8, 7]`` of ``[..., K, N]`` into int8
    bytes ``[..., K/2, N]``: byte row ``i`` = ``(q[2i+1] << 4) | (q[2i]
    & 0xF)``.  This row-interleaved convention is EXACTLY the layout
    ``pltpu.bitcast(·, int4)`` exposes on TPU (int4 vectors pack pairs
    along sublanes), so the kernel reinterprets a DMA'd packed chunk as
    int4 for free.  Packed int8 is also what crosses jit boundaries —
    native s4 arrays trip a backend transfer bug on this stack.
    """
    lo = q[..., 0::2, :].astype(jnp.int32) & 0xF
    hi = (q[..., 1::2, :].astype(jnp.int32) & 0xF) << 4
    return jax.lax.bitcast_convert_type((lo | hi).astype(jnp.uint8), jnp.int8)


def unpack_int4_rows(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_rows`: int8 ``[..., K/2, N]`` →
    int8 ``[..., K, N]`` with nibbles sign-extended.  Plain-XLA arithmetic
    (used by the emulator and the interpret-mode kernel); the compiled
    kernel gets the same values from a ``pltpu.bitcast`` instead."""
    b = jax.lax.bitcast_convert_type(p, jnp.uint8).astype(jnp.int32)
    lo = b & 0xF
    lo = lo - 16 * (lo >> 3)  # sign-extend the nibble
    hi = b >> 4
    hi = hi - 16 * (hi >> 3)
    out = jnp.stack([lo, hi], axis=-2)  # [..., K/2, 2, N]
    return out.reshape(*p.shape[:-2], 2 * p.shape[-2], p.shape[-1]).astype(
        jnp.int8
    )


def quantize_int4_equilibrated(w: jnp.ndarray):
    """Symmetric int4 quantization of ``[..., K, N]`` with exact per-row
    equilibration: ``w ≈ diag(u) · unpack(q) · diag(s)`` with ``u`` per
    input row and ``s`` per output column.

    Because the activations stay bf16 (W4A16), ``u`` is a FREE parameter —
    the caller folds it into the activations (``(x·u) @ q · s``), which is
    exact algebra, not an approximation.  Dividing each row by its max
    first removes the inter-row dynamic range from every column, so the
    4-bit per-column grid only has to cover intra-column shape, not
    magnitude — the standard weight-equilibration trick.

    Returns ``(q_packed int8 [..., K/2, N]`` (see :func:`pack_int4_rows`),
    ``s f32 [..., 1, N], u f32 [..., 1, K])``.

    Scheme choice (measured, Gaussian weights, per-matmul output rel
    error): row-equilibration + per-column scale (this function) 0.148;
    K-group-128 scales 0.118; equilibration + K-group-128 0.121;
    group-128 with the full [-8, 7] grid 0.106; int8 per-column 0.008.
    Group-wise K scales would buy only ~20 % — the 4-bit floor is
    intrinsic on unstructured weights, so the kernel keeps the simplest
    exact-algebra scheme (no sub-dot rescale chain) and the tier stays
    opt-in with its fidelity published by the bench's ``..._int4``
    teacher-forced agreement line.  Trained weights have structure random
    init lacks; re-evaluate via ``scripts/fetch_and_verify.py`` when the
    published checkpoint is reachable.
    """
    wf = w.astype(jnp.float32)
    u = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)  # [..., K, 1]
    u = jnp.where(u > 0, u, 1.0)
    wn = wf / u
    amax = jnp.max(jnp.abs(wn), axis=-2, keepdims=True)  # [..., 1, N]
    s = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wn / s), -7, 7).astype(jnp.int8)
    return pack_int4_rows(q), s, jnp.swapaxes(u, -1, -2)


def prepare_streamed_backbone(params: dict, config: CSMConfig, bits: int = 8) -> dict:
    """Quantize the backbone + c0 head for the streamed decode-step kernel.

    Norm folding as in :func:`..fused_decoder.prepare_fused_decoder`:
    ``rmsnorm(x, nw) @ W == rs(x) * (x @ (diag(nw) W))``; the final norm
    folds into ``codebook0_head``.  Per-matrix quantization before
    concatenation keeps each fused column's scale exact.  The Q and K
    output columns (and their scales) are permuted into rotary-half order
    (see module docstring) — an exact relabeling.

    ``bits=4`` stores the four layer-matmul families as **int4** with
    per-row equilibration scales (:func:`quantize_int4_equilibrated`)
    applied through the kernel's activation prescales — halving the decode
    step's dominant HBM traffic again (~0.97 GB → ~0.49 GB).  The fused
    q/k/v (and gate/up) share one input vector, so their row scale ``u``
    is computed over the CONCATENATED columns.  The c0 head stays int8
    (its 4.5 MB is noise in the stream, and logit fidelity decides the
    sampled token).  The returned bundle carries a ``"u"`` subtree; its
    pytree STRUCTURE is what tells :func:`bb_decode_step` to build the
    int4 kernel (a value leaf would be traced away under jit).

    ``bits=16`` builds the **EXACT bf16 tier**: weights stay bf16 (only the
    Q/K rotary-half column permutation is applied — a relabeling), NO norm
    folding (the RMSNorm weights ship separately in an ``"nw"`` subtree and
    the kernel applies them to the activations in the same order the XLA
    path does), and the kernel mirrors the XLA bf16 decode path's rounding
    discipline — every dot output and elementwise product is rounded to
    bf16 exactly where ``models/llama.py`` rounds.  This is the
    greedy-parity tier: same weight values, same rounding points as the
    parity-tested XLA path (reference semantics:
    ``/root/reference/modeling_csm.py:640-659``), at the streamed-kernel's
    HBM-floor speed.  The ``"nw"`` subtree marks the bundle (pytree
    structure is static under jit, like int4's ``"u"``).
    """
    bcfg = config.backbone
    nq, nkv, hd = bcfg.num_attention_heads, bcfg.num_key_value_heads, bcfg.head_dim
    bl = params["backbone"]["layers"]
    attn_nw = bl["attn_norm"].astype(jnp.float32)[:, :, None]  # [L, D, 1]
    mlp_nw = bl["mlp_norm"].astype(jnp.float32)[:, :, None]

    def folded(name, fold=None, perm=None):
        w = bl[name].astype(jnp.float32)
        if fold is not None:
            w = w * fold
        if perm is not None:
            w = w[:, :, perm]
        return w

    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128

    if bits == 16:
        # EXACT tier: the families are built WITHOUT the norm fold (folding
        # would round the folded product to bf16, breaking weight-value
        # identity with the XLA path).  Only the exact column permutation
        # is applied.
        out = {"w": {}, "nw": {}}
        out["w"]["wqkv"] = jnp.concatenate(
            [
                folded("wq", None, _half_perm(nq, hd)),
                folded("wk", None, _half_perm(nkv, hd)),
                folded("wv"),
            ],
            axis=-1,
        ).astype(jnp.bfloat16)
        out["w"]["w_gu"] = jnp.concatenate(
            [folded("w_gate"), folded("w_up")], axis=-1
        ).astype(jnp.bfloat16)
        out["w"]["wo"] = folded("wo").astype(jnp.bfloat16)
        out["w"]["w_down"] = folded("w_down").astype(jnp.bfloat16)
        head = params["codebook0_head"].astype(jnp.bfloat16)
        out["w"]["head"] = jnp.pad(head, ((0, 0), (0, Va_pad - Va)))
        # Norm weights ride as bf16-valued f32 vectors; the permuted-Q/K
        # scale sections need no permutation (norms apply on the INPUT
        # side, which is unpermuted).
        out["nw"]["attn"] = attn_nw[:, None, :, 0]  # [L, 1, D] f32
        out["nw"]["mlp"] = mlp_nw[:, None, :, 0]
        out["final_norm"] = params["backbone"]["final_norm"].astype(
            jnp.float32
        )
        return out

    fam = {
        "wqkv": jnp.concatenate(
            [
                folded("wq", attn_nw, _half_perm(nq, hd)),
                folded("wk", attn_nw, _half_perm(nkv, hd)),
                folded("wv", attn_nw),
            ],
            axis=-1,
        ),
        "w_gu": jnp.concatenate(
            [folded("w_gate", mlp_nw), folded("w_up", mlp_nw)], axis=-1
        ),
        "wo": folded("wo"),
        "w_down": folded("w_down"),
    }
    out = {"w": {}, "s": {}}
    if bits == 4:
        out["u"] = {}
        for name, w in fam.items():
            out["w"][name], out["s"][name], out["u"][name] = (
                quantize_int4_equilibrated(w)
            )
    elif bits == 8:
        for name, w in fam.items():
            out["w"][name], out["s"][name] = quantize_per_channel(w)
    else:
        raise ValueError(f"bits must be 4, 8, or 16, got {bits}")

    fnw = params["backbone"]["final_norm"].astype(jnp.float32)
    head = params["codebook0_head"].astype(jnp.float32) * fnw[:, None]
    hq, hs = quantize_per_channel(head)
    out["w"]["head"] = jnp.pad(hq, ((0, 0), (0, Va_pad - Va)))
    out["s"]["head"] = jnp.pad(hs, ((0, 0), (0, Va_pad - Va)), constant_values=1.0)
    out["final_norm"] = fnw
    return out


def rope_tables_flat(
    cos: jnp.ndarray, sin: jnp.ndarray, nq: int, nkv: int, hd: int
):
    """Expand per-stream ``cos/sin [B, hd]`` into flat permuted-layout
    tables ``[B, nq*hd]`` / ``[B, nkv*hd]`` (outside-the-kernel XLA ops).

    In [first halves | second halves] order, lane blocks are head-major, so
    the table is ``tile(cos[:hd/2], H)`` then ``tile(cos[hd/2:], H)``."""
    half = hd // 2

    def expand(t, H):
        t = t.astype(jnp.float32)
        return jnp.concatenate(
            [jnp.tile(t[:, :half], (1, H)), jnp.tile(t[:, half:], (1, H))],
            axis=1,
        )

    return expand(cos, nq), expand(sin, nq), expand(cos, nkv), expand(sin, nkv)


# ---------------------------------------------------------------------------
# Shared math (kernel body AND emulator — textually identical)
# ---------------------------------------------------------------------------


def _qdot(x_bf16: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """Raw W8A16 dot: bf16 activations × int8 weights, fp32 accumulation.
    (Scale applied by the caller — down-proj row chunks must sum raw.)"""
    return jax.lax.dot_general(
        x_bf16, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 dot (exact for one-hot data-movement matmuls)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _rope_flat(x: jnp.ndarray, cos_f: jnp.ndarray, sin_f: jnp.ndarray) -> jnp.ndarray:
    """RoPE on the flat permuted layout: rotate-half is one global concat
    because all first halves precede all second halves.  ``x [B, H*hd]``."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
    return x * cos_f + rotated * sin_f


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _xla_rmsnorm(h: jnp.ndarray, nw: jnp.ndarray, eps: float, rnd) -> jnp.ndarray:
    """The XLA path's RMSNorm (``models/llama.py:rmsnorm``) on a bf16-valued
    f32 residual: f32 mean/rsqrt, round the normed vector to bf16 (the XLA
    path's ``normed.astype(dtype)``), multiply by the bf16-valued norm
    weight, round again (bf16 elementwise multiply) — two rounding points,
    exactly where the XLA path rounds."""
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    return rnd(rnd(h * jax.lax.rsqrt(var + eps)) * nw)


def _perm_head_of_lane(n_lanes: int, H: int, hd: int, rows: int) -> jnp.ndarray:
    """[rows, n_lanes] int32: which head owns each PERMUTED-layout lane."""
    half_tot = H * (hd // 2)
    c = _iota2((rows, n_lanes), 1)
    return jnp.where(c < half_tot, c // (hd // 2), (c - half_tot) // (hd // 2))


def _rows_from_flat(
    x_perm: jnp.ndarray, B: int, H: int, hd: int
) -> jnp.ndarray:
    """[B, H*hd] (permuted layout) -> head rows [B*H, hd], via two exact
    one-hot matmuls (no shape casts).  Row r = (b, i) holds head i of
    stream b in standard dim order."""
    R = B * H
    n = H * hd
    # replicate each stream's flat vector to its H rows
    selb = (_iota2((R, B), 0) // H == _iota2((R, B), 1)).astype(jnp.float32)
    rep = _fdot(selb, x_perm)  # [R, n]
    head_of = _perm_head_of_lane(n, H, hd, R)
    own = (head_of == _iota2((R, n), 0) % H).astype(jnp.float32)
    # gather the owned lanes into standard head-dim order: gq[c, d] = 1 iff
    # permuted lane c carries head-dim d (no transposes — iota-built)
    half = hd // 2
    half_tot = H * half
    c = _iota2((n, hd), 0)
    dim_of = jnp.where(c < half_tot, c % half, half + (c - half_tot) % half)
    gq = (dim_of == _iota2((n, hd), 1)).astype(jnp.float32)  # [n, hd]
    return _fdot(rep * own, gq)  # [R, hd]


def _flat_from_rows(rows: jnp.ndarray, B: int, H: int, hd: int) -> jnp.ndarray:
    """Head rows [B*H, hd] -> [B, H*hd] in STANDARD (unpermuted) layout,
    via two exact one-hot matmuls."""
    R = B * H
    n = H * hd
    expand = (_iota2((hd, n), 1) % hd == _iota2((hd, n), 0)).astype(jnp.float32)
    rep = _fdot(rows, expand)  # [R, n] — each row's values at every head slot
    own = (_iota2((R, n), 1) // hd == _iota2((R, n), 0) % H).astype(jnp.float32)
    selb = (_iota2((B, R), 1) // H == _iota2((B, R), 0)).astype(jnp.float32)
    return _fdot(selb, rep * own)  # [B, n]


def _perm_to_std(x_perm: jnp.ndarray, H: int, hd: int) -> jnp.ndarray:
    """[B, H*hd] permuted layout -> standard layout via one one-hot matmul."""
    n = H * hd
    half = hd // 2
    half_tot = H * half
    # std column m = (head j, dim d) comes from perm column p(m)
    m_row = _iota2((n, n), 0)
    j = m_row // hd
    d = m_row % hd
    p = jnp.where(d < half, j * half + d, half_tot + j * half + (d - half))
    pk = (p == _iota2((n, n), 1)).astype(jnp.float32)  # [n(std rows m), n(perm)]
    # x_std[:, m] = x_perm[:, p(m)]  ->  x_std = x_perm @ pk^T
    return jax.lax.dot_general(
        x_perm, pk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attend_flat(
    q_rows: jnp.ndarray,  # [B*nq, hd] f32 (rotated, standard dim order)
    k_win: jnp.ndarray,  # [Wp, B*nkv*hd] bf16 — row W = the new key
    v_win: jnp.ndarray,  # [Wp, B*nkv*hd] bf16
    bias: jnp.ndarray,  # [B, Wp] f32 — 0 = usable key slot, NEG_INF = not
    B: int,
    nq: int,
    nkv: int,
) -> jnp.ndarray:
    """Block-diagonal merged GQA over a biased window (decode step, T=1) —
    all streams and heads in two big dots, with one-hot matmuls for the
    block scatter/gather (no shape casts).

    Key validity comes from the caller's PRE-PADDED bias vector: row ``W``
    (the token's own new K/V) carries 0, padding rows past it NEG_INF —
    padding happens outside the kernel so no lane concat is needed here.
    Returns attention output rows ``[B*nq, hd]`` f32.

    The block-diagonal intermediates (qz / own-mask / out) are
    ``[B·nq, B·nkv·hd]`` — B² scaling that blows the scoped-VMEM budget
    past B=16 (measured 207 MB at B=32).  Large batches therefore split
    into GROUPS of 8 streams, each its own block-diagonal pair of dots
    over that group's window columns: streams are independent in
    attention, the dropped off-group blocks contributed exact-0.0
    partials only, and the emulator shares this very function, so kernel
    == emulator stays bit-exact at every batch.  B ≤ 16 keeps the
    original single-pair form (hardware-validated numbers unchanged).
    """
    hd = q_rows.shape[-1]
    if B > 16:
        outs = []
        for g0 in range(0, B, 8):
            gb = min(8, B - g0)
            outs.append(_attend_flat(
                q_rows[g0 * nq:(g0 + gb) * nq],
                k_win[:, g0 * nkv * hd:(g0 + gb) * nkv * hd],
                v_win[:, g0 * nkv * hd:(g0 + gb) * nkv * hd],
                bias[g0:g0 + gb], gb, nq, nkv,
            ))
        return jnp.concatenate(outs, axis=0)
    g = nq // nkv
    R = B * nq
    C = B * nkv
    scale = 1.0 / (hd ** 0.5)

    # qz[r, cb*hd + d] = q_rows[r, d] iff cb == block(r) = (b, head//g)
    ridx = _iota2((R, C * hd), 0)
    rblk = ridx // nq * nkv + ridx % nq // g
    own = (rblk == _iota2((R, C * hd), 1) // hd).astype(jnp.float32)
    gc = (_iota2((hd, C * hd), 1) % hd == _iota2((hd, C * hd), 0)).astype(
        jnp.float32
    )  # [hd, C*hd]
    qz = _fdot(q_rows, gc) * own  # [R, C*hd]

    scores = jax.lax.dot_general(
        qz.astype(jnp.bfloat16), k_win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [R, Wp]
    selb = (_iota2((R, B), 0) // nq == _iota2((R, B), 1)).astype(jnp.float32)
    bias_rows = _fdot(selb, bias)  # [R, Wp] (bias values are 0/NEG_INF: exact)
    scores = jnp.where(bias_rows >= 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v_win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, C*hd] — row r's true output sits in column block rblk[r]
    return jax.lax.dot_general(
        out * own, gc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, hd]


def _merge_streams(x: jnp.ndarray) -> jnp.ndarray:
    """[B, n] -> [1, B*n] (the merged window row), via two exact one-hot
    matmuls — a B-way lane concat of row slices trips a Mosaic internal
    error at B=8, and the kernel's style is MXU data movement anyway."""
    B, n = x.shape
    if B == 1:
        return x
    tile = (_iota2((n, B * n), 1) % n == _iota2((n, B * n), 0)).astype(
        jnp.float32
    )  # [n, B*n]: replicate each lane into every stream block
    own = (_iota2((B, B * n), 1) // n == _iota2((B, B * n), 0)).astype(
        jnp.float32
    )  # [B, B*n]: stream b owns block b
    return _fdot(jnp.ones((1, B), jnp.float32), _fdot(x, tile) * own)


def _layer_attention(
    qkv: jnp.ndarray,  # [B, (nq+2*nkv)*hd] f32 — scaled projections
    # (q and k segments in permuted rotary-half layout)
    k_win_fn,  # () -> [Wp, B*nkv*hd] bf16 window (with row W pre-written)
    v_win_fn,
    write_row_fn,  # (k_row [1, B*nkv*hd], v_row) -> None — called pre-attend
    bias: jnp.ndarray,  # [B, Wp] f32 (pre-padded: row W = 0, beyond = NEG_INF)
    cos_qf: jnp.ndarray,  # [B, nq*hd] f32 flat permuted rope tables
    sin_qf: jnp.ndarray,
    cos_kf: jnp.ndarray,  # [B, nkv*hd]
    sin_kf: jnp.ndarray,
    nq: int,
    nkv: int,
    hd: int,
    rnd=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RoPE + window update + GQA attention for one layer; shared verbatim
    by the kernel and the emulator.  Returns ``(attn [B, nq*hd] standard
    layout, k_new [B, nkv*hd] standard, v_new [B, nkv*hd])``.

    ``rnd`` (EXACT bf16 tier): a bf16-rounding hook applied after RoPE —
    the XLA path's ``apply_rope`` computes in f32 and casts back to the
    bf16 activation dtype (``ops/rope.py:84-91``); this mirrors that cast.
    """
    B = qkv.shape[0]
    q_roped = _rope_flat(qkv[:, : nq * hd], cos_qf, sin_qf)
    k_roped = _rope_flat(qkv[:, nq * hd : (nq + nkv) * hd], cos_kf, sin_kf)
    if rnd is not None:
        q_roped = rnd(q_roped)
        k_roped = rnd(k_roped)
    k_new = _perm_to_std(k_roped, nkv, hd)  # [B, nkv*hd] standard (cache) order
    v_new = qkv[:, (nq + nkv) * hd :]

    write_row_fn(
        _merge_streams(k_new).astype(jnp.bfloat16),
        _merge_streams(v_new).astype(jnp.bfloat16),
    )
    q_rows = _rows_from_flat(q_roped, B, nq, hd)  # [B*nq, hd]
    out_rows = _attend_flat(q_rows, k_win_fn(), v_win_fn(), bias, B, nq, nkv)
    attn = _flat_from_rows(out_rows, B, nq, hd)  # [B, nq*hd] standard
    return attn, k_new, v_new


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _dims(config: CSMConfig, int4: bool = False):
    """Chunking geometry shared by the kernel body, emulator, and caller.

    In int4 mode the int8 head does NOT ride the (int4) a-ring — it gets a
    dedicated buffer — so ``a_cols`` excludes ``Va_pad``.
    """
    bcfg = config.backbone
    D, F = bcfg.hidden_size, bcfg.intermediate_size
    nq, nkv, hd = bcfg.num_attention_heads, bcfg.num_key_value_heads, bcfg.head_dim
    QKVN = (nq + 2 * nkv) * hd
    Va_pad = -(-config.audio_vocab_size // 128) * 128
    chunk_gu = CHUNK_N if 2 * F % CHUNK_N == 0 and 2 * F >= CHUNK_N else 2 * F
    chunk_dn = CHUNK_N if F % CHUNK_N == 0 and F >= CHUNK_N else F
    a_cols = max(QKVN, D, chunk_gu) if int4 else max(QKVN, D, chunk_gu, Va_pad)
    return {
        "QKVN": QKVN, "Va_pad": Va_pad,
        "chunk_gu": chunk_gu, "n_gu": 2 * F // chunk_gu,
        "chunk_dn": chunk_dn, "n_dn": F // chunk_dn,
        "a_cols": a_cols,
    }


def _make_kernel(config: CSMConfig, B: int, W: int, Wp: int, depth: int,
                 int4: bool = False, interpret: bool = False,
                 exact: bool = False):
    bcfg = config.backbone
    L = bcfg.num_hidden_layers
    D = bcfg.hidden_size
    F = bcfg.intermediate_size
    nq, nkv, hd = bcfg.num_attention_heads, bcfg.num_key_value_heads, bcfg.head_dim
    eps = bcfg.rms_norm_eps
    C = B * nkv
    dims = _dims(config, int4)
    QKVN, Va_pad = dims["QKVN"], dims["Va_pad"]
    chunk_gu, n_gu = dims["chunk_gu"], dims["n_gu"]
    chunk_dn, n_dn = dims["chunk_dn"], dims["n_dn"]

    # A-ring entry e = l*epl + j (j=0: qkv, j=1: wo, j=2+c: gate-up chunk c);
    # entry L*epl is the head.  B-ring entry e = l*n_dn + r.  Slot = e % depth
    # on both rings, so issuing entry e+depth always refills the slot entry e
    # just vacated — the layer body is traced ONCE inside a fori_loop (the
    # fully unrolled version took Mosaic ~25 min to compile; this one is
    # ~16× smaller) and every refill is pure index math on the layer index.
    # int4 mode: the rings hold int4 chunks (half the bytes per entry); the
    # int8 head does NOT ride the a-ring — it streams once into a dedicated
    # buffer whose DMA is issued at warm-up (needed last, so it always
    # arrives in the shadow of the layer stream).
    epl = 2 + n_gu

    def kernel(*refs):
        (
            h0_ref,  # VMEM (B, D) f32
            cos_qf_ref, sin_qf_ref,  # VMEM (B, nq*hd) f32 — flat perm tables
            cos_kf_ref, sin_kf_ref,  # VMEM (B, nkv*hd) f32
            bias_ref,  # VMEM (B, Wp) f32 (pre-padded by the caller)
            fnw_ref,  # VMEM (1, D) f32
        ) = refs[:7]
        i = 7
        if exact:
            nw_attn, nw_mlp = refs[i:i + 2]  # VMEM f32 [L, 1, D]
            i += 2
        else:
            s_qkv, s_wo, s_gu, s_dn = refs[i:i + 4]  # VMEM f32 [L, 1, N]
            s_head = refs[i + 4]  # VMEM f32 (1, Va_pad)
            i += 5
        if int4:
            u_qkv, u_wo, u_gu, u_dn = refs[i:i + 4]  # VMEM f32 [L, 1, K]
            i += 4
        (
            w_qkv, w_wo, w_gu, w_dn, w_head,  # ANY int8/int4 (HBM)
            k_hbm, v_hbm,  # ANY bf16 [L, B, W, nkv*hd]
            nh_ref,  # out VMEM (B, D) f32
            lg_ref,  # out VMEM (B, Va_pad) f32
            nk_ref, nv_ref,  # out VMEM (L, B, nkv*hd) bf16
            ring_a,  # scratch VMEM (depth, D, a_cols) int8/int4
            ring_b,  # scratch VMEM (depth, chunk_dn, D) int8/int4
            kbuf, vbuf,  # scratch VMEM (2, Wp, C*hd) bf16
            sem_a, sem_b,  # DMA sems (depth,)
            sem_kv,  # DMA sems (2, 2, B)
        ) = refs[i:i + 18]
        if int4:
            head_buf, sem_h = refs[i + 18:]  # VMEM (D, Va_pad) int8

        def ring_w(ring, slot, ncols):
            """Consume a ring chunk as int8.  int4 mode: the chunk arrives
            as row-PACKED int8 (two nibble rows per byte row); a bitcast
            reinterprets it as the [2K, N] int4 vector TPU natively packs
            along sublanes, and the sign-extending convert to int8 rides
            the VPU far below the DMA rate.  Interpret mode has no Mosaic
            bitcast — same values via arithmetic unpack."""
            w = ring[slot][:, :ncols]
            if not int4:
                return w
            if interpret:
                return unpack_int4_rows(w)
            return pltpu.bitcast(w, jnp.int4).astype(jnp.int8)
        def a_dma(l, j, slot):
            """Copy descriptor for a-ring entry (layer ``l``, kind ``j``);
            ``j`` is always static, ``l``/``slot`` may be traced."""
            if j == 0:
                src, ncols = w_qkv.at[l], QKVN
            elif j == 1:
                src, ncols = w_wo.at[l], D
            else:
                c = j - 2
                src = w_gu.at[l, :, pl.ds(c * chunk_gu, chunk_gu)]
                ncols = chunk_gu
            return pltpu.make_async_copy(
                src, ring_a.at[slot, :, pl.ds(0, ncols)], sem_a.at[slot]
            )

        def head_dma(slot):
            if int4:
                return pltpu.make_async_copy(w_head, head_buf, sem_h)
            return pltpu.make_async_copy(
                w_head, ring_a.at[slot, :, pl.ds(0, Va_pad)], sem_a.at[slot]
            )

        def b_dma(l, r, slot):
            # int4: HBM rows are packed 2-per-byte, so a chunk of chunk_dn
            # weight rows occupies chunk_dn/2 byte rows.
            rows = chunk_dn // 2 if int4 else chunk_dn
            return pltpu.make_async_copy(
                w_dn.at[l, pl.ds(r * rows, rows), :],
                ring_b.at[slot], sem_b.at[slot],
            )

        def slot_a(l, j):
            if epl % depth == 0:
                return j % depth  # static — 6 entries/layer, depth 3
            return jax.lax.rem(l * epl + j, depth)

        def slot_b(l, r):
            if n_dn % depth == 0:
                return r % depth
            return jax.lax.rem(l * n_dn + r, depth)

        def issue_next_a(l, j, slot):
            """Refill ``slot`` with a-entry (l, j)+depth (guarded at the
            tail: the last layer's refills are next-layer entries that do
            not exist; the unique one landing exactly on L*epl is the head).
            Called AFTER the dot that read the slot, so program order
            guarantees the overwrite cannot race the read."""
            jn = (j + depth) % epl
            off = (j + depth) // epl
            if off == 0:
                a_dma(l, jn, slot).start()
            elif jn == 0:
                @pl.when(l + off < L)
                def _():
                    a_dma(l + off, 0, slot).start()

                if not int4:  # int4: the head has its own buffer + warm-up DMA
                    @pl.when(l + off == L)
                    def _():
                        head_dma(slot).start()
            else:
                @pl.when(l + off < L)
                def _():
                    a_dma(l + off, jn, slot).start()

        def issue_next_b(l, r, slot):
            rn = (r + depth) % n_dn
            off = (r + depth) // n_dn
            if off == 0:
                b_dma(l, rn, slot).start()
            else:
                @pl.when(l + off < L)
                def _():
                    b_dma(l + off, rn, slot).start()

        # --- KV window streamer (double-buffered across layers) -----------
        def kv_dma(buf, l, b, which):
            src = (k_hbm if which == 0 else v_hbm).at[l, b]
            dst = (kbuf if which == 0 else vbuf).at[
                buf, :W, b * nkv * hd : (b + 1) * nkv * hd
            ]
            return pltpu.make_async_copy(src, dst, sem_kv.at[buf, which, b])

        def kv_start(buf, l):
            for b in range(B):
                kv_dma(buf, l, b, 0).start()
                kv_dma(buf, l, b, 1).start()

        def kv_wait(buf, l):
            for b in range(B):
                kv_dma(buf, l, b, 0).wait()
                kv_dma(buf, l, b, 1).wait()

        # --- warm-up: fill the rings and the first KV window ---------------
        kv_start(0, 0)
        if int4:
            head_dma(0).start()  # dedicated buffer; consumed after the layers
        n_a, n_b = L * epl + (0 if int4 else 1), L * n_dn
        for e in range(min(depth, n_a)):
            if e < L * epl:
                a_dma(e // epl, e % epl, e % depth).start()
            else:
                head_dma(e % depth).start()
        for e in range(min(depth, n_b)):
            b_dma(e // n_dn, e % n_dn, e % depth).start()
        # Zero the window padding rows (uninitialized VMEM may hold NaN and
        # 0-prob × NaN would poison the attention output; the emulator's
        # explicit zero rows are the contract).
        for buf in range(2):
            kbuf[buf, W:, :] = jnp.zeros((Wp - W, C * hd), jnp.bfloat16)
            vbuf[buf, W:, :] = jnp.zeros((Wp - W, C * hd), jnp.bfloat16)

        bias = bias_ref[:]
        cos_qf, sin_qf = cos_qf_ref[:], sin_qf_ref[:]
        cos_kf, sin_kf = cos_kf_ref[:], sin_kf_ref[:]

        # EXACT tier's bf16-rounding hook.  Inside a compiled Mosaic kernel
        # the convert pair is compiled literally (no excess-precision
        # elision — see fused_decoder.bf16_round), so the astype spelling is
        # the rounding op there; interpret mode lowers the body through XLA,
        # where the pair CAN be elided, so it uses reduce_precision like the
        # emulator (identical round-to-nearest-even values either way).
        if interpret:
            rnd = bf16_round
        else:
            rnd = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)  # noqa: E731

        def layer_body_exact(l, h):
            """XLA-bf16-path-mirroring layer: same weight values (no norm
            fold, no scales) and a bf16 rounding at every point the XLA
            decode path rounds (``models/llama.py:_layer`` with bf16
            params) — dot outputs, RoPE casts, residual adds, the silu
            chain.  The residual ``h`` is carried as bf16-valued f32."""
            @pl.when(l + 1 < L)
            def _():
                kv_start(jax.lax.rem(l + 1, 2), l + 1)

            # -- attention ----------------------------------------------
            xn = _xla_rmsnorm(h, nw_attn[l], eps, rnd)
            slot = slot_a(l, 0)
            a_dma(l, 0, slot).wait()
            qkv = rnd(_qdot(xn.astype(jnp.bfloat16), ring_w(ring_a, slot, QKVN)))
            issue_next_a(l, 0, slot)

            buf = jax.lax.rem(l, 2)
            kv_wait(buf, l)

            def write_row(k_row, v_row):
                kbuf[buf, pl.ds(W, 1), :] = k_row
                vbuf[buf, pl.ds(W, 1), :] = v_row

            attn, k_new, v_new = _layer_attention(
                qkv,
                lambda: kbuf[buf],
                lambda: vbuf[buf],
                write_row, bias,
                cos_qf, sin_qf, cos_kf, sin_kf, nq, nkv, hd,
                rnd=rnd,
            )
            attn = rnd(attn)  # the XLA out-einsum emits bf16
            nk_ref[l] = k_new.astype(jnp.bfloat16)
            nv_ref[l] = v_new.astype(jnp.bfloat16)

            slot = slot_a(l, 1)
            a_dma(l, 1, slot).wait()
            wo_out = rnd(_qdot(attn.astype(jnp.bfloat16), ring_w(ring_a, slot, D)))
            issue_next_a(l, 1, slot)
            h = rnd(h + wo_out)  # bf16 residual add

            # -- MLP ------------------------------------------------------
            xn = _xla_rmsnorm(h, nw_mlp[l], eps, rnd)
            h_bf = xn.astype(jnp.bfloat16)
            parts = []
            for c in range(n_gu):
                slot = slot_a(l, 2 + c)
                a_dma(l, 2 + c, slot).wait()
                acc = rnd(_qdot(h_bf, ring_w(ring_a, slot, chunk_gu)))
                issue_next_a(l, 2 + c, slot)
                parts.append(acc)
            gu = jnp.concatenate(parts, axis=1)  # [B, 2F] bf16-valued f32
            g, u = gu[:, :F], gu[:, F:]
            # XLA's jax.nn.silu on bf16: logistic rounds to bf16, each
            # multiply rounds to bf16.
            gated = rnd(rnd(g * rnd(jax.nn.sigmoid(g))) * u)
            gated_bf = gated.astype(jnp.bfloat16)
            dn_acc = jnp.zeros((B, D), jnp.float32)
            for r in range(n_dn):
                slot = slot_b(l, r)
                b_dma(l, r, slot).wait()
                dn_acc = dn_acc + _qdot(
                    gated_bf[:, r * chunk_dn : (r + 1) * chunk_dn],
                    ring_w(ring_b, slot, D),
                )
                issue_next_b(l, r, slot)
            # ONE rounding of the full-K dot output (row chunks summed raw
            # in f32, as the MXU's internal f32 accumulation would).
            return rnd(h + rnd(dn_acc))

        def layer_body(l, h):
            @pl.when(l + 1 < L)
            def _():
                kv_start(jax.lax.rem(l + 1, 2), l + 1)

            # -- attention ----------------------------------------------
            rs = _rms_scale(h, eps)
            xq = h * u_qkv[l] if int4 else h  # exact equilibration fold
            slot = slot_a(l, 0)
            a_dma(l, 0, slot).wait()
            qkv = _qdot(xq.astype(jnp.bfloat16), ring_w(ring_a, slot, QKVN))
            issue_next_a(l, 0, slot)
            qkv = qkv * s_qkv[l] * rs

            buf = jax.lax.rem(l, 2)
            kv_wait(buf, l)

            def write_row(k_row, v_row):
                kbuf[buf, pl.ds(W, 1), :] = k_row
                vbuf[buf, pl.ds(W, 1), :] = v_row

            attn, k_new, v_new = _layer_attention(
                qkv,
                lambda: kbuf[buf],
                lambda: vbuf[buf],
                write_row, bias,
                cos_qf, sin_qf, cos_kf, sin_kf, nq, nkv, hd,
            )
            nk_ref[l] = k_new.astype(jnp.bfloat16)
            nv_ref[l] = v_new.astype(jnp.bfloat16)

            xo = attn * u_wo[l] if int4 else attn
            slot = slot_a(l, 1)
            a_dma(l, 1, slot).wait()
            wo_out = _qdot(xo.astype(jnp.bfloat16), ring_w(ring_a, slot, D))
            issue_next_a(l, 1, slot)
            h = h + wo_out * s_wo[l]

            # -- MLP ------------------------------------------------------
            rs = _rms_scale(h, eps)
            xg = h * u_gu[l] if int4 else h
            h_bf = xg.astype(jnp.bfloat16)
            parts = []
            for c in range(n_gu):
                slot = slot_a(l, 2 + c)
                a_dma(l, 2 + c, slot).wait()
                acc = _qdot(h_bf, ring_w(ring_a, slot, chunk_gu))
                issue_next_a(l, 2 + c, slot)
                parts.append(acc * s_gu[l][:, c * chunk_gu : (c + 1) * chunk_gu])
            gu = jnp.concatenate(parts, axis=1) * rs  # [B, 2F] f32
            gated = jax.nn.silu(gu[:, :F]) * gu[:, F:]
            if int4:
                gated = gated * u_dn[l]
            gated = gated.astype(jnp.bfloat16)
            dn_acc = jnp.zeros((B, D), jnp.float32)
            for r in range(n_dn):
                slot = slot_b(l, r)
                b_dma(l, r, slot).wait()
                dn_acc = dn_acc + _qdot(
                    gated[:, r * chunk_dn : (r + 1) * chunk_dn],
                    ring_w(ring_b, slot, D),
                )
                issue_next_b(l, r, slot)
            return h + dn_acc * s_dn[l]

        h = jax.lax.fori_loop(
            0, L, layer_body_exact if exact else layer_body,
            h0_ref[:].astype(jnp.float32),
        )

        # -- final norm + c0 head ------------------------------------------
        if exact:
            # XLA: normed = rmsnorm(h, final_norm) -> bf16; logits =
            # normed @ head (bf16 dot, bf16 out).
            nh = _xla_rmsnorm(h, fnw_ref[0][None, :], eps, rnd)
            nh_ref[:] = nh
            slot = (L * epl) % depth
            head_dma(slot).wait()
            lg_ref[:] = rnd(
                _qdot(nh.astype(jnp.bfloat16), ring_a[slot][:, :Va_pad])
            )
            return
        rs_f = _rms_scale(h, eps)
        nh_ref[:] = h * rs_f * fnw_ref[0][None, :]
        if int4:
            head_dma(0).wait()
            logits = _qdot(h.astype(jnp.bfloat16), head_buf[:])
        else:
            slot = (L * epl) % depth
            head_dma(slot).wait()
            logits = _qdot(h.astype(jnp.bfloat16), ring_a[slot][:, :Va_pad])
        # Round through bf16: the XLA path's c0 head matmul outputs bf16
        # (modeling parity for the downstream top-k filter).
        lg_ref[:] = (
            (logits * s_head[:] * rs_f).astype(jnp.bfloat16).astype(jnp.float32)
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def bb_decode_step(
    qsb: dict,
    config: CSMConfig,
    h0: jnp.ndarray,  # [B, D] — frame embedding (embed-sum, done outside)
    cos: jnp.ndarray,  # [B, hd] f32 — RoPE values at each stream's position
    sin: jnp.ndarray,  # [B, hd] f32
    bias_w: jnp.ndarray,  # [B, W] f32 — 0 usable / NEG_INF masked key slots
    k_cache: jnp.ndarray,  # [L, B, W, nkv, hd] bf16 (the KVCache arrays)
    v_cache: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One backbone decode step through the streamed-weight kernel.

    Returns ``(normed_h [B, D] f32, c0_logits [B, Va] f32,
    new_k [L, B, nkv, hd] bf16, new_v [L, B, nkv, hd] bf16)``.  The caller
    scatters the new rows into the cache (the kernel is pure).
    """
    bcfg = config.backbone
    L, D = bcfg.num_hidden_layers, bcfg.hidden_size
    nq, nkv, hd = bcfg.num_attention_heads, bcfg.num_key_value_heads, bcfg.head_dim
    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128
    B = h0.shape[0]
    W = k_cache.shape[2]
    Wp = W + 8  # row W = new token; rows W+1.. masked padding
    C = B * nkv
    # Bundle-mode detection by pytree STRUCTURE: the "u" equilibration
    # subtree only exists for bits=4 prepares; the "nw" norm-weight subtree
    # only for the bits=16 EXACT tier.  Structure is static under jit, so
    # the modes compile to distinct programs.
    int4 = "u" in qsb
    exact = "nw" in qsb

    # Ring depth: deepest that fits VMEM (two rings + two KV window
    # buffers), capped at 4 — measured at 1B/B=1: depth 3 = 1.394 ms/step,
    # 4 = 1.324 (with 2048-col chunks), 6 = 1.367 (deeper is WORSE: more
    # outstanding DMAs contend).
    dims = _dims(config, int4)
    w_elt = 0.5 if int4 else (2 if exact else 1)
    ring_bytes = int((D * dims["a_cols"] + dims["chunk_dn"] * D) * w_elt)
    kv_bytes = 2 * 2 * Wp * C * hd * 2
    # The EXACT tier's bf16 rings are 2x the int8 rings, so the depth
    # heuristic must ALSO budget the B-scaled attention/merge temporaries
    # (recomputed below for vmem_limit) or B=8 exact picks a depth whose
    # rings alone leave no stack headroom.  The int8/int4 tiers keep the
    # original budget — their depth choices are hardware-pinned.
    Ba_d = min(B, 16) if B <= 16 else 8
    extras = 0
    if exact:
        extras = (
            3 * (Ba_d * nq) * (Ba_d * nkv * hd) * 4
            + (nkv * hd) * (C * hd) * 4 * 2
            + 8 * 1024 * 1024  # stack/scheduler slack
        )
    depth = 2
    # EXACT tier: depth 3 measured FASTER than 4 on hardware (2.60 vs
    # 2.78 ms/step at B=1 W=256, 92.3% HBM util — the 21 MB bf16 ring
    # entries make 4 outstanding DMAs contend; same "deeper is worse"
    # effect the int8 notes above record past depth 4).
    for d in ((3,) if exact else (4, 3)):
        if d * ring_bytes + kv_bytes + extras < 100 * 1024 * 1024:
            depth = d
            break
    env_depth = os.environ.get("CSM_BB_RING_DEPTH")
    if env_depth:
        # Perf experimentation knob (scripts/check_bb_hw.py).  Read at
        # TRACE time: set it before the first call in a fresh process —
        # changing it later is ignored by jit-cached programs.
        depth = int(env_depth)

    # Pre-pad the bias to the full window: row W (the token's own new K/V)
    # is always attendable, padding rows beyond are masked — done here so
    # the kernel needs no lane concat.
    bias_p = jnp.pad(
        bias_w.astype(jnp.float32), ((0, 0), (0, Wp - W)),
        constant_values=NEG_INF,
    ).at[:, W].set(0.0)

    kernel = _make_kernel(config, B, W, Wp, depth, int4, interpret, exact)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    out_shapes = (
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((B, Va_pad), jnp.float32),
        jax.ShapeDtypeStruct((L, B, nkv * hd), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, B, nkv * hd), jnp.bfloat16),
    )
    # Scratch + head buffer + temporaries.  The block-diagonal attention's
    # intermediates (qz / own-mask / out, each [B·nq, B·nkv·hd] f32) scale
    # with B², so the slack must grow with the batch or B=16 trips the
    # scoped-vmem allocator.  Past B=16 the attention runs in 8-stream
    # groups (_attend_flat), so its temporaries are ONE group's — the
    # estimate below RELIES on Mosaic reusing the stack across the
    # sequentially-unrolled groups (liveness invariant: group g's qz/own/
    # out die before group g+1's are built; only the [gb*nq, hd] outputs
    # survive into the final concatenate).  This held at B=32 but is
    # liveness-fragile, so each additional group contributes an explicit
    # slack term (its surviving output rows plus headroom for scheduler
    # variance) rather than assuming perfect reuse.  The window-row merge
    # (_merge_streams) additionally materializes a [nkv·hd, B·nkv·hd]
    # one-hot tile that grows linearly with B.
    Ba = min(B, 16) if B <= 16 else 8
    n_groups = 1 if B <= 16 else -(-B // 8)
    attn_tmp = 3 * (Ba * nq) * (Ba * nkv * hd) * 4
    group_slack = (n_groups - 1) * (Ba * nq) * (Ba * nkv * hd) * 4
    merge_tmp = (nkv * hd) * (C * hd) * 4 * 2
    vmem_limit = (
        depth * ring_bytes + kv_bytes + Va_pad * D * max(1, int(w_elt))
        + attn_tmp + merge_tmp + group_slack + 24 * 1024 * 1024
    )

    # int4 rings hold row-PACKED int8 bytes (half the rows) — see
    # pack_int4_rows; the kernel bitcasts each chunk back to int4.  The
    # EXACT tier's rings hold bf16 weights directly.
    rdiv = 2 if int4 else 1
    ring_dtype = jnp.bfloat16 if exact else jnp.int8
    scratch = [
        pltpu.VMEM((depth, D // rdiv, dims["a_cols"]), ring_dtype),
        pltpu.VMEM((depth, dims["chunk_dn"] // rdiv, D), ring_dtype),
        pltpu.VMEM((2, Wp, C * hd), jnp.bfloat16),
        pltpu.VMEM((2, Wp, C * hd), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((depth,)),
        pltpu.SemaphoreType.DMA((depth,)),
        pltpu.SemaphoreType.DMA((2, 2, B)),
    ]
    u_args = ()
    if int4:
        scratch += [
            pltpu.VMEM((D, Va_pad), jnp.int8),  # dedicated head buffer
            pltpu.SemaphoreType.DMA,
        ]
        u_args = (
            qsb["u"]["wqkv"], qsb["u"]["wo"], qsb["u"]["w_gu"],
            qsb["u"]["w_down"],
        )
    if exact:
        # Norm weights replace the per-channel scales (bf16-valued f32).
        sn_args = (qsb["nw"]["attn"], qsb["nw"]["mlp"])
    else:
        sn_args = (
            qsb["s"]["wqkv"], qsb["s"]["wo"], qsb["s"]["w_gu"],
            qsb["s"]["w_down"], qsb["s"]["head"],
        )

    nh, lg, nk, nv = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vm] * (7 + len(sn_args) + len(u_args)) + [anyspec] * 7,
        out_specs=(vm, vm, vm, vm),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_limit), 127 * 1024 * 1024),
        ),
        interpret=interpret,
    )(
        h0.astype(jnp.float32),
        *rope_tables_flat(cos, sin, nq, nkv, hd),
        bias_p,
        qsb["final_norm"].reshape(1, D),
        *sn_args,
        *u_args,
        qsb["w"]["wqkv"], qsb["w"]["wo"], qsb["w"]["w_gu"], qsb["w"]["w_down"],
        qsb["w"]["head"],
        k_cache.reshape(L, B, W, nkv * hd).astype(jnp.bfloat16),
        v_cache.reshape(L, B, W, nkv * hd).astype(jnp.bfloat16),
    )
    return (
        nh,
        lg[:, :Va],
        nk.reshape(L, B, nkv, hd),
        nv.reshape(L, B, nkv, hd),
    )


# ---------------------------------------------------------------------------
# Emulator (pure-JAX oracle — op-for-op identical chunked math)
# ---------------------------------------------------------------------------


def emulate_bb_decode_step(
    qsb: dict,
    config: CSMConfig,
    h0: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    bias_w: jnp.ndarray,
    k_cache: jnp.ndarray,  # [L, B, W, nkv, hd]
    v_cache: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-JAX replica of the kernel's arithmetic: same chunk boundaries
    (gate-up column chunks, down-proj row-chunk partial sums), same one-hot
    movement matmuls, same casts, same merged window with the new-token
    row.  Compare under jit (see module docstring)."""
    bcfg = config.backbone
    L, D, F = bcfg.num_hidden_layers, bcfg.hidden_size, bcfg.intermediate_size
    nq, nkv, hd = bcfg.num_attention_heads, bcfg.num_key_value_heads, bcfg.head_dim
    eps = bcfg.rms_norm_eps
    Va = config.audio_vocab_size
    B = h0.shape[0]
    W = k_cache.shape[2]
    Wp = W + 8
    C = B * nkv
    dims = _dims(config)
    QKVN = dims["QKVN"]
    chunk_gu, n_gu = dims["chunk_gu"], dims["n_gu"]
    chunk_dn, n_dn = dims["chunk_dn"], dims["n_dn"]

    k_cache = k_cache.reshape(L, B, W, nkv * hd).astype(jnp.bfloat16)
    v_cache = v_cache.reshape(L, B, W, nkv * hd).astype(jnp.bfloat16)

    int4 = "u" in qsb
    exact = "nw" in qsb

    def wmat(name, l=None):
        w = qsb["w"][name] if l is None else qsb["w"][name][l]
        return unpack_int4_rows(w) if (int4 and name != "head") else w

    h = h0.astype(jnp.float32)
    cos_qf, sin_qf, cos_kf, sin_kf = rope_tables_flat(cos, sin, nq, nkv, hd)
    bias_p = jnp.pad(
        bias_w.astype(jnp.float32), ((0, 0), (0, Wp - W)),
        constant_values=NEG_INF,
    ).at[:, W].set(0.0)
    nk, nv = [], []

    if exact:
        # EXACT bf16 tier: mirror the kernel's layer_body_exact op-for-op
        # (same chunk boundaries, same one-hot movements, same rounding
        # points as the XLA bf16 decode path).  ``h0`` arrives bf16-valued
        # (the embed-sum runs in the bf16 param dtype) — neither side
        # re-rounds it.
        rnd = bf16_round
        for l in range(L):
            xn = _xla_rmsnorm(h, qsb["nw"]["attn"][l], eps, rnd)
            qkv = rnd(_qdot(xn.astype(jnp.bfloat16), wmat("wqkv", l)[:, :QKVN]))

            row = {}

            def write_row(k_row, v_row, _row=row):
                _row["k"] = k_row
                _row["v"] = v_row

            base_k = k_cache[l].transpose(1, 0, 2).reshape(W, C * hd)
            base_v = v_cache[l].transpose(1, 0, 2).reshape(W, C * hd)
            zeros = jnp.zeros((Wp - W - 1, C * hd), jnp.bfloat16)
            attn, k_new, v_new = _layer_attention(
                qkv,
                lambda: jnp.concatenate([base_k, row["k"], zeros]),
                lambda: jnp.concatenate([base_v, row["v"], zeros]),
                write_row, bias_p,
                cos_qf, sin_qf, cos_kf, sin_kf, nq, nkv, hd,
                rnd=rnd,
            )
            attn = rnd(attn)
            nk.append(k_new.astype(jnp.bfloat16))
            nv.append(v_new.astype(jnp.bfloat16))
            h = rnd(h + rnd(_qdot(attn.astype(jnp.bfloat16), wmat("wo", l))))

            xn = _xla_rmsnorm(h, qsb["nw"]["mlp"][l], eps, rnd)
            h_bf = xn.astype(jnp.bfloat16)
            parts = [
                rnd(_qdot(h_bf, wmat("w_gu", l)[:, c * chunk_gu : (c + 1) * chunk_gu]))
                for c in range(n_gu)
            ]
            gu = jnp.concatenate(parts, axis=1)
            g, u = gu[:, :F], gu[:, F:]
            gated = rnd(rnd(g * rnd(jax.nn.sigmoid(g))) * u)
            gated_bf = gated.astype(jnp.bfloat16)
            dn_acc = jnp.zeros((B, D), jnp.float32)
            for r in range(n_dn):
                dn_acc = dn_acc + _qdot(
                    gated_bf[:, r * chunk_dn : (r + 1) * chunk_dn],
                    wmat("w_down", l)[r * chunk_dn : (r + 1) * chunk_dn, :],
                )
            h = rnd(h + rnd(dn_acc))

        nh = _xla_rmsnorm(h, qsb["final_norm"][None, :], eps, rnd)
        logits = rnd(_qdot(nh.astype(jnp.bfloat16), qsb["w"]["head"]))
        return (
            nh,
            logits[:, :Va],
            jnp.stack(nk).reshape(L, B, nkv, hd),
            jnp.stack(nv).reshape(L, B, nkv, hd),
        )
    for l in range(L):
        rs = _rms_scale(h, eps)
        xq = h * qsb["u"]["wqkv"][l] if int4 else h
        qkv = _qdot(xq.astype(jnp.bfloat16), wmat("wqkv", l)[:, :QKVN])
        qkv = qkv * qsb["s"]["wqkv"][l] * rs

        row = {}

        def write_row(k_row, v_row, _row=row):
            _row["k"] = k_row
            _row["v"] = v_row

        base_k = k_cache[l].transpose(1, 0, 2).reshape(W, C * hd)
        base_v = v_cache[l].transpose(1, 0, 2).reshape(W, C * hd)
        zeros = jnp.zeros((Wp - W - 1, C * hd), jnp.bfloat16)
        attn, k_new, v_new = _layer_attention(
            qkv,
            lambda: jnp.concatenate([base_k, row["k"], zeros]),
            lambda: jnp.concatenate([base_v, row["v"], zeros]),
            write_row, bias_p,
            cos_qf, sin_qf, cos_kf, sin_kf, nq, nkv, hd,
        )
        nk.append(k_new.astype(jnp.bfloat16))
        nv.append(v_new.astype(jnp.bfloat16))
        xo = attn * qsb["u"]["wo"][l] if int4 else attn
        h = h + _qdot(xo.astype(jnp.bfloat16), wmat("wo", l)) * qsb["s"]["wo"][l]

        rs = _rms_scale(h, eps)
        xg = h * qsb["u"]["w_gu"][l] if int4 else h
        h_bf = xg.astype(jnp.bfloat16)
        parts = [
            _qdot(h_bf, wmat("w_gu", l)[:, c * chunk_gu : (c + 1) * chunk_gu])
            * qsb["s"]["w_gu"][l][:, c * chunk_gu : (c + 1) * chunk_gu]
            for c in range(n_gu)
        ]
        gu = jnp.concatenate(parts, axis=1) * rs
        gated = jax.nn.silu(gu[:, :F]) * gu[:, F:]
        if int4:
            gated = gated * qsb["u"]["w_down"][l]
        gated = gated.astype(jnp.bfloat16)
        dn_acc = jnp.zeros((B, D), jnp.float32)
        for r in range(n_dn):
            dn_acc = dn_acc + _qdot(
                gated[:, r * chunk_dn : (r + 1) * chunk_dn],
                wmat("w_down", l)[r * chunk_dn : (r + 1) * chunk_dn, :],
            )
        h = h + dn_acc * qsb["s"]["w_down"][l]

    rs_f = _rms_scale(h, eps)
    nh = h * rs_f * qsb["final_norm"][None, :]
    logits = bf16_round(
        _qdot(h.astype(jnp.bfloat16), qsb["w"]["head"]) * qsb["s"]["head"] * rs_f
    )
    return (
        nh,
        logits[:, :Va],
        jnp.stack(nk).reshape(L, B, nkv, hd),
        jnp.stack(nv).reshape(L, B, nkv, hd),
    )

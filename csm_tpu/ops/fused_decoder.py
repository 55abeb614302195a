"""Fused intra-frame decoder: the whole 31-step codebook loop in ONE Pallas
kernel with quantized decoder weights resident in VMEM.

Why.  Single-stream generation is HBM-bandwidth-bound: the reference's inner
loop (``/root/reference/modeling_csm.py:555-576``) and our XLA ``lax.scan``
equivalent both re-read every decoder weight from HBM on each of the 31
sequential steps — ~220 MB × 31 ≈ 6.8 GB per 80 ms frame, a ~8 ms floor at
v5e's 819 GB/s.  This kernel loads the decoder ONCE per frame:

- all decoder matmul weights are **int8 (symmetric, per-output-channel)** —
  ~106 MB, resident in VMEM (v5e has 128 MB) across all 31 steps;
- matmuls run **W8A16**: bf16 activations against the int8 weights
  directly on the MXU (the 8-bit operand expands in the pipe), fp32
  accumulation, per-output-channel rescale — no dequantized weight copy is
  ever materialized and no activation quantization error is introduced;
- per-step ``audio_head`` slices (4.2 MB bf16) are double-buffered from HBM
  by async DMA, overlapped with the decoder forward (the int8 head's f32
  rescale rows stream alongside their slices);
- the in-frame KV scratch stores bf16 (matching the XLA path's bf16 KV
  cache) with 32 rows exactly, and the attention dots run bf16×bf16 with
  f32 accumulation;
- sampled-token embeddings are fetched by data-dependent DMA from a
  **pre-projected** embedding table (``audio_embeddings @ projection``,
  computed once at prepare time), so the per-step projection matmul
  disappears;
- top-k sampling runs in-kernel: the exact k-th largest logit is found by a
  16-step bisection over the (bf16-rounded) float bit pattern, then a
  Gumbel-max draw uses
  noise precomputed outside with the same ``jax.random`` keys the XLA path
  would consume (:mod:`csm_tpu.ops.sampling` semantics, reference
  ``modeling_csm.py:170-189``).

The per-frame HBM traffic for the intra-frame loop drops from ~6.8 GB to
~130 MB (head slices + embedding rows).

Numerics: the residual stream, norms, attention, and logit rescales are fp32;
only matmul inputs are quantized.  The quantized path is **opt-in**
(``qdec=`` in :func:`csm_tpu.generation.generate_compiled`);
greedy token parity vs the reference is guaranteed only for the default XLA
path.  :func:`emulate_decode_codebooks` is a pure-JAX op-for-op emulator of
this kernel used as the correctness oracle in tests (bit-exact in interpret
mode).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csm_tpu.config import CSMConfig
from csm_tpu.ops.rope import compute_rope_table

NEG_INF = -1e9

# Largest batch a SINGLE fully-resident kernel program serves
# (scripts/check_fused_hw.py + KERNEL_CHECKS.json pin it on hardware).  A
# resident B=16 program does NOT fit this backend's scoped-VMEM limit
# (118.7 MiB): the resident int8 weights (~111 MB) plus head buffer and
# B-scaled scratch measured 121.5 MB with the bf16 head and still
# ~119.5 MB after the round-4 shaves (int8 single-slot head, bf16 32-row
# KV scratch, streamed head-rescale rows, bf16 attention operands) — so
# B > 8 rides the STREAMED-w_down variant below (9..16 in one program),
# and only batches past that split into decode_frame_fused's sequential
# chunks: exact per-row numerics, one extra weight reload (~0.13 ms) +
# serial 31-step latency per chunk.  The kernel beats the XLA loop's
# flat ~8.5 ms weight-bound floor up to MAX_CHUNKED_B.  The int8 head
# (head_bits=8) halves the head-slice DMA traffic and VMEM buffer.
# (Historical note: round 3 pinned a resident B=16 single program in
# emulator mode as MAX_VALIDATED_B_1SLOT=16; hardware measurement showed
# it cannot compile on this backend, so the resident cap is 8 for both
# head widths and B=16 is served by the streamed tier instead.)
MAX_VALIDATED_B = 8
MAX_VALIDATED_B_1SLOT = 8  # int8 head: same single-program cap (see above)
# Single-program cap for the STREAMED-w_down kernel variant (stream_down=
# True): w_down (~34 MB int8, the largest weight family) leaves VMEM and
# streams per layer through a 2-slot double buffer (~17 MB), freeing ~17 MB
# of scoped VMEM — enough for one B=16 program where the resident form
# measures ~119.5 MB against the 118.7 MiB limit.  The per-pass slice DMA
# (8.4 MB ≈ 10 µs) hides under the next layer's compute; steady-state cost
# is ~1 GB/frame of extra HBM reads fully overlapped with the serial-matvec
# latency the kernel is bound by.  Hardware-validated at 16
# (scripts/check_fused_hw.py --stream-down; KERNEL_CHECKS.json).
MAX_VALIDATED_B_STREAMDOWN = 16
# Single-program cap for the STREAM-EVERYTHING variant (stream_gu=True,
# implies stream_down): w_gu (~64 MB int8, gate‖up fused) ALSO leaves VMEM,
# streamed as per-layer gate/up halves ([Dd, F] ≈ 8 MB each) through a
# 2-slot ring — slot 0 cycles the gate halves, slot 1 the up halves.  Net
# scoped-VMEM saving vs resident w_gu is ~48 MB, which is what lets ONE
# B=32 program compile (the stream_down-only form measured 147 MB against
# the 118.7 MiB cap).  The kernel is then HBM-bound: ~96 MB of w_gu+w_down
# slices per pass × 33 passes ≈ 3.1 GB/frame ≈ 3.9 ms at 819 GB/s — still
# well under two sequential B=16 streamed chunks (2 × ~2.9 ms), because
# the 31-step serial latency is paid once.  Column-half dots are bitwise
# identical to the fused dot (per-output-column f32 accumulation is
# independent), so kernel == emulator stays exact.  Hardware-validated at
# 32 (scripts/check_fused_hw.py 32 8; KERNEL_CHECKS.json
# fused_decoder_kernel_B32_h8).
MAX_VALIDATED_B_STREAMGU = 32
MAX_CHUNKED_B = 4 * MAX_VALIDATED_B

_MATS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
# The kernel consumes the fused projections (QKV / gate-up concatenated);
# the separate forms stay in the bundle for the emulator oracle.
_KERNEL_MATS = ("wqkv", "wo", "w_gu", "w_down")


# ---------------------------------------------------------------------------
# Preparation: quantize weights, pre-project embeddings
# ---------------------------------------------------------------------------


def bf16_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round f32 values onto the bf16 grid WITHOUT a convert pair.

    The obvious spelling ``x.astype(bf16).astype(f32)`` is NOT safe in
    XLA-compiled code on this TPU backend: ``--xla_allow_excess_precision``
    (set terminal-side) lets the compiler elide the narrowing convert pair
    in one consumer while keeping it in another, so the "same" logits can
    compare unequal to themselves across uses — observed on hardware as
    ``first_argmax``'s ``x == max(x)`` matching nowhere and returning its
    2**30 sentinel for every codebook.  ``lax.reduce_precision`` is
    semantically a rounding op (identical round-to-nearest-even values)
    that the simplifier never removes.  Pallas kernel bodies keep the
    astype spelling — Mosaic compiles converts literally.
    """
    return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


def quantize_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of ``[..., K, N]``.

    Returns ``(q int8 [..., K, N], scale f32 [..., 1, N])`` with
    ``w ≈ q * scale``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, N]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def prepare_fused_decoder(
    params: dict, config: CSMConfig, head_bits: int = 16
) -> dict:
    """Build the kernel's parameter bundle from a CSM param pytree.

    One-time cost per model load: quantizes the decoder stack + pre-projects
    the audio embedding table through ``projection`` (the XLA path computes
    ``embed(ci) @ proj`` per step; here it is a table lookup).

    ``head_bits`` must be 8 or 16.  ``head_bits=8`` additionally quantizes
    the per-step ``audio_head``
    slices to int8 (symmetric per-output-channel, W8A16 dot + f32 rescale
    in-kernel): the head's VMEM buffer and its ~138 MB/frame of slice DMA
    traffic both halve.  The default keeps the bf16 head — bit-identical
    logits to the XLA quantized path's head matmul.
    """
    if head_bits not in (8, 16):
        raise ValueError(f"head_bits must be 8 or 16, got {head_bits}")
    dec = params["decoder"]["layers"]
    dcfg = config.decoder
    Dd = dcfg.hidden_size
    out = {"w": {}, "s": {}}

    # RMSNorm WEIGHT FOLDING: rmsnorm(x, nw) @ W == rs * (x @ (diag(nw) W))
    # with rs = rsqrt(mean(x²)+eps) a per-row scalar.  Folding nw into the
    # pre-norm matrices (before quantization) lets the kernel start the MXU
    # dot on the RAW residual stream while the rs reduce runs concurrently —
    # the normalization leaves the serial dependency chain entirely.
    attn_nw = dec["attn_norm"].astype(jnp.float32)[:, :, None]  # [L, D, 1]
    mlp_nw = dec["mlp_norm"].astype(jnp.float32)[:, :, None]

    def quant(name, fold=None):
        w = dec[name].astype(jnp.float32)
        if fold is not None:
            w = w * fold
        q, s = quantize_per_channel(w)
        out["w"][name] = q
        out["s"][name] = s  # [L, 1, N]

    quant("wq", attn_nw)
    quant("wk", attn_nw)
    quant("wv", attn_nw)
    quant("wo")
    quant("w_gate", mlp_nw)
    quant("w_up", mlp_nw)
    quant("w_down")
    # Fused projections: Q/K/V and gate/up concatenated on the output axis —
    # one MXU dot each instead of 3 + 2.  Per-output-channel scales make the
    # concatenation bit-identical to the separate matmuls (each column keeps
    # its own scale), so the emulator's separate-matmul form stays an exact
    # oracle.  The separate forms remain in the bundle for that oracle (HBM
    # is plentiful; the kernel's VMEM only receives the fused forms).
    out["w"]["wqkv"] = jnp.concatenate(
        [out["w"]["wq"], out["w"]["wk"], out["w"]["wv"]], axis=-1
    )
    out["s"]["wqkv"] = jnp.concatenate(
        [out["s"]["wq"], out["s"]["wk"], out["s"]["wv"]], axis=-1
    )
    out["w"]["w_gu"] = jnp.concatenate(
        [out["w"]["w_gate"], out["w"]["w_up"]], axis=-1
    )
    out["s"]["w_gu"] = jnp.concatenate(
        [out["s"]["w_gate"], out["s"]["w_up"]], axis=-1
    )
    cos, sin = compute_rope_table(dcfg, config.decoder_rope_positions)
    out["cos"] = cos.astype(jnp.float32)
    out["sin"] = sin.astype(jnp.float32)

    emb_dtype = params["audio_embeddings"].dtype
    proj_emb = params["audio_embeddings"] @ params["projection"]  # [rows, Dd]
    rows = proj_emb.shape[0]
    lanes = min(Dd, 128)
    out["proj_emb"] = proj_emb.reshape(rows, Dd // lanes, lanes).astype(emb_dtype)
    # Zero-pad the head's vocab axis to a lane multiple: per-step DMA slices
    # must be 128-aligned on the minor dimension; padding lanes are masked to
    # NEG_INF before sampling.  The decoder's final_norm weight folds into
    # the head rows (same trick as above; the rs scalar applies post-dot).
    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128
    head_dtype = params["audio_head"].dtype
    fnw = params["decoder"]["final_norm"].astype(jnp.float32)[None, :, None]
    head = params["audio_head"].astype(jnp.float32) * fnw
    if head_bits == 8:
        hq, hs = quantize_per_channel(head)  # amax over Dd (axis -2)
        out["audio_head"] = jnp.pad(hq, ((0, 0), (0, 0), (0, Va_pad - Va)))
        out["head_scale"] = jnp.pad(
            hs, ((0, 0), (0, 0), (0, Va_pad - Va)), constant_values=1.0
        )  # [N-1, 1, Va_pad] f32
    else:
        out["audio_head"] = jnp.pad(
            head.astype(head_dtype), ((0, 0), (0, 0), (0, Va_pad - Va))
        )  # [N-1, Dd, Va_pad]
    return out


# ---------------------------------------------------------------------------
# Shared math (used by both the kernel body and the emulator — keeping them
# textually identical is what makes the emulator a bit-exact oracle)
# ---------------------------------------------------------------------------


def _rms_scale(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm's per-row scalar ``rsqrt(mean(x²)+eps)`` — applied to matmul
    OUTPUTS (norm weights are folded into the matrices at prepare time), so
    this reduce runs concurrently with the MXU dot instead of ahead of it."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return jax.lax.rsqrt(var + eps)


def _qmm(x: jnp.ndarray, wq: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """W8A16 matmul: bf16 activations × int8 weights directly on the MXU
    (Mosaic expands the 8-bit operand in the pipe — int8 magnitudes ≤127
    are exact in bf16, so this equals a bf16 matmul against the dequantized
    weights), fp32 accumulation, per-output-channel rescale on the output.

    Measured on one v5e this is the fastest serial-matvec form (~4.6 µs vs
    ~9.3 µs for W8A8 with dynamic activation quant — the per-row abs-max /
    round / clip chain sat on the dependency-critical path), and it has no
    activation quantization error at all.  ``x [T,K] f32``, ``wq [K,N]``
    int8, ``s [1,N] f32``."""
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * s


def _rope_f32(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x [T, H, hd]`` by ``cos/sin [T, hd]`` (HF rotate_half)."""
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * c + rotated * s


def _attend(
    q: jnp.ndarray,  # [T, nq, hd] f32 (rotated)
    k_all: jnp.ndarray,  # [nkv, S, hd] f32 — full cache window
    v_all: jnp.ndarray,  # [nkv, S, hd]
    pos0,  # scalar: absolute position of q row 0
) -> jnp.ndarray:
    """Causal GQA over the static window.  Returns ``[T, nq*hd]`` f32.

    Single-stream form of :func:`_attend_merged` (kept as the emulator's
    call shape)."""
    T, nq, hd = q.shape
    nkv, S, _ = k_all.shape
    k_cat = k_all.transpose(1, 0, 2).reshape(S, nkv * hd)
    v_cat = v_all.transpose(1, 0, 2).reshape(S, nkv * hd)
    return _attend_merged(q[None], k_cat, v_cat, pos0, nkv).reshape(T, nq * hd)


def _attend_merged(
    q: jnp.ndarray,  # [B, T, nq, hd] f32 (rotated)
    k_cat: jnp.ndarray,  # [S, B*nkv*hd] f32 — cache windows, merged layout
    v_cat: jnp.ndarray,  # [S, B*nkv*hd]
    pos0,  # scalar: absolute position of q row 0 (streams are aligned)
    nkv: int,
) -> jnp.ndarray:
    """Causal GQA for ALL streams and KV heads in TWO dots (block-diagonal).

    The kernel is latency-bound on serial MXU issues: a per-(stream,
    kv-head) loop costs ``B*nkv*2`` tiny dots per layer (32 at B=8, the
    batched path's dominant overhead).  Instead, queries are scattered into
    a block-diagonal ``[B*T*nq, B*nkv*hd]`` operand whose row (b,t,i) holds
    q[b,t,i] in column block (b, j=i//g) and zeros elsewhere; one dot
    against the concatenated keys ``[S, B*nkv*hd]`` yields every stream's
    scores, and one dot of the softmaxed probs against the concatenated
    values yields outputs, recovered by masking the off-block columns and
    summing.  The zero blocks contribute exact fp 0.0 partials, so results
    are bit-identical to the looped form.  Returns ``[B, T, nq*hd]`` f32.

    Dot operands ride the MXU in bf16 (f32 accumulation): K/V arrive from
    bf16 storage (matching the XLA path's bf16 KV cache), q and the probs
    round through bf16 — this halves the block-diagonal operand's VMEM
    footprint (the B=16 single-program tier's scoped-VMEM budget is the
    binding constraint) and is the dtype the XLA Llama stack uses for its
    attention matmuls anyway.  Softmax stays f32.
    """
    B, T, nq, hd = q.shape
    S = k_cat.shape[0]
    g = nq // nkv
    scale = 1.0 / (hd ** 0.5)
    R = B * T * nq  # score rows, ordered (b, t, i)
    C = B * nkv  # column blocks, ordered (b, j)

    # block(b,t,i) -> b*nkv + i//g : the column block row r attends to.
    row_block = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) // (T * nq) * nkv
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) % nq // g
    )
    col_block = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    bmask = (row_block == col_block).astype(jnp.float32)  # [R, C]

    qz = q.reshape(R, 1, hd) * bmask[:, :, None]  # [R, C, hd]
    # (A bf16 qz build was tried for scoped-VMEM headroom and measured
    # WORSE — Mosaic's bf16 broadcast/relayout materialization cost ~2 MB
    # more stack than the f32 form it replaced.  Keep f32, cast at the dot.)

    scores = jax.lax.dot_general(
        qz.reshape(R, C * hd).astype(jnp.bfloat16),
        k_cat.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [R, S]
    qpos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (R, S), 0) % (T * nq) // nq
    kpos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    scores = jnp.where(kpos <= qpos, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v_cat.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, C*hd] — row (b,t,i)'s true output sits in column block (b, i//g)
    out = jnp.sum(out.reshape(R, C, hd) * bmask[:, :, None], axis=1)  # [R, hd]
    return out.reshape(B, T, nq * hd)


def _sample_row(
    logits: jnp.ndarray,  # [B, V] f32
    gumbel: jnp.ndarray,  # [B, V] f32
    temperature,  # scalar f32 or [B, 1] per-row
    topk,  # int or [B, 1] int32 per-row
    greedy: bool,
) -> jnp.ndarray:
    """One Gumbel-top-k draw per row (ties at the k-th value kept, as in
    :func:`csm_tpu.ops.sampling.topk_mask`).  Each row's k-th largest value
    is found EXACTLY by bisection over orderable float bit patterns — no
    sort.  ``temperature`` / ``topk`` may be per-row ``[B, 1]`` vectors
    (the per-request serving path): the bisection count compare is already
    row-shaped, so per-row k is free.  Returns ``[B]`` int32.

    Argmax is spelled as "smallest index among the maxima": bf16-rounded
    logits make EXACT ties common (~2051 values land in a few hundred bf16
    buckets), and Mosaic's native argmax lowering breaks ties differently
    from XLA's first-occurrence rule — the explicit min-where form is
    deterministic and identical on every backend."""

    def first_argmax(x):
        m = jnp.max(x, axis=-1, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.min(
            jnp.where(x == m, idx, jnp.int32(2**30)), axis=-1
        ).astype(jnp.int32)

    if greedy:
        return first_argmax(logits)
    scaled = logits / jnp.maximum(temperature, 1e-6)
    # Select on the RAW logits (temperature scaling is monotonic, so the
    # top-k set is identical).  The logits arrive bf16-rounded, so every
    # real candidate's f32 pattern has zero low mantissa bits and distinct
    # candidates have distinct high-16 prefixes — 16 bisection steps over
    # the high bits find the exact k-th largest.
    u = jax.lax.bitcast_convert_type(logits, jnp.uint32)
    neg = (u >> 31) > 0
    ukey = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))

    def bit_body(b, t):  # t: [B, 1] per-row threshold prefix
        cand = t | jax.lax.shift_left(jnp.uint32(1), jnp.uint32(31 - b))
        cnt = jnp.sum((ukey >= cand).astype(jnp.int32), axis=-1, keepdims=True)
        return jnp.where(cnt >= topk, cand, t)

    # Statically unrolled (16 fixed steps): lets the compiler software-
    # pipeline the compare/reduce chain instead of a sequential fori_loop.
    kth = jnp.zeros((logits.shape[0], 1), jnp.uint32)
    for b in range(16):
        kth = bit_body(b, kth)
    filtered = jnp.where(ukey >= kth, scaled, NEG_INF)
    return first_argmax(filtered + gumbel)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _decoder_pass(
    x: jnp.ndarray,  # [B*T, Dd] f32, rows ordered stream-major (b*T + t)
    pos0,  # scalar int32
    B: int,
    T: int,
    dcfg,
    eps: float,
    w_refs: dict,
    s_refs: dict,
    cos_ref,
    sin_ref,
    kv_k,
    kv_v,
    wd_stream=None,  # (wd_hbm, wd_buf, wd_sem): stream w_down per layer
    wgu_stream=None,  # (wgu_hbm, wgu_buf, wgu_sem): stream w_gu halves
) -> jnp.ndarray:
    """One forward pass of the 4-layer decoder over ``T`` tokens of ``B``
    streams starting at absolute position ``pos0`` (all streams are
    position-aligned inside a frame), reading/writing the VMEM KV scratch.
    Returns each stream's LAST hidden, final-norm-scaled, ``[B, Dd]`` —
    ready for the (final_norm-folded) head matmul.

    Norm weights are folded into the quantized matrices; each pre-norm
    matmul consumes the raw residual stream with the rs scalar applied to
    its output, so the norm reduce overlaps the dot.  Attention for ALL
    streams and KV heads is two block-diagonal dots per layer
    (:func:`_attend_merged`); the KV scratch is stored pre-merged as
    ``[L, N=32, B*nkv*hd]`` bf16 (rows = positions 0..31; see the scratch_shapes note) so reads need no transpose.  Batching is near-free
    here: serial matvec latency dominates, and extra rows ride the same
    MXU passes — the basis of the batched serving path's aggregate
    throughput.
    """
    L = dcfg.num_hidden_layers
    nq, nkv, hd = dcfg.num_attention_heads, dcfg.num_key_value_heads, dcfg.head_dim
    Dd = dcfg.hidden_size

    F = dcfg.intermediate_size
    cos_t = cos_ref[pl.ds(pos0, T)]  # [T, hd]
    sin_t = sin_ref[pl.ds(pos0, T)]
    cos = jnp.broadcast_to(cos_t[None], (B, T, hd)).reshape(B * T, hd)
    sin = jnp.broadcast_to(sin_t[None], (B, T, hd)).reshape(B * T, hd)
    h = x
    for l in range(L):
        qkv = _qmm(h, w_refs["wqkv"][l], s_refs["wqkv"][l]) * _rms_scale(h, eps)
        q = qkv[:, : nq * hd].reshape(B * T, nq, hd)
        k = qkv[:, nq * hd : (nq + nkv) * hd].reshape(B * T, nkv, hd)
        q = _rope_f32(q, cos, sin)
        k = _rope_f32(k, cos, sin)
        # Write rows into the merged window layout: row = position, columns
        # = (stream, kv head, hd).  k/v rows arrive stream-major (b*T + t);
        # the [B, T] -> [T, B] swap is a tiny VPU shuffle (T <= 2).
        k_rows = k.reshape(B, T, nkv * hd).swapaxes(0, 1).reshape(T, B * nkv * hd)
        v_rows = (
            qkv[:, (nq + nkv) * hd :]
            .reshape(B, T, nkv * hd)
            .swapaxes(0, 1)
            .reshape(T, B * nkv * hd)
        )
        if isinstance(pos0, int):
            # Static start (the 2-token prefill at position 0): a direct
            # vector store, provably tile-aligned.
            kv_k[l, pl.ds(pos0, T), :] = k_rows.astype(jnp.bfloat16)
            kv_v[l, pl.ds(pos0, T), :] = v_rows.astype(jnp.bfloat16)
        else:
            # Traced position (the per-step single-row append): bf16 VMEM
            # packs two sublanes per register row, so Mosaic rejects a
            # vector store at an offset it cannot prove 8-aligned — update
            # the row by a masked full-buffer select instead (the window is
            # a few hundred KB of VMEM; the following attention reads all
            # of it anyway).  Values are identical to the sliced store, so
            # the emulator's dynamic_update_slice stays bit-exact.
            assert T == 1, "traced-position KV append is single-row"
            P_rows = kv_k.shape[1]
            row_sel = (
                jax.lax.broadcasted_iota(jnp.int32, (P_rows, 1), 0) == pos0
            )
            kv_k[l] = jnp.where(row_sel, k_rows.astype(jnp.bfloat16), kv_k[l])
            kv_v[l] = jnp.where(row_sel, v_rows.astype(jnp.bfloat16), kv_v[l])
        attn = _attend_merged(
            q.reshape(B, T, nq, hd), kv_k[l], kv_v[l], pos0, nkv
        ).reshape(B * T, nq * hd)
        h = h + _qmm(attn, w_refs["wo"][l], s_refs["wo"][l])
        if wgu_stream is None:
            gu = _qmm(h, w_refs["w_gu"][l], s_refs["w_gu"][l]) * _rms_scale(h, eps)
            gated = jax.nn.silu(gu[:, :F]) * gu[:, F:]
        else:
            # Streamed w_gu (the B=32 single-program tier): the fused
            # [Dd, 2F] gate‖up matrix lives in HBM as 2L half-slices
            # ([Dd, F]; slice 2l = layer l's gate columns, 2l+1 = up).
            # Slot s%2 holds slice s — slot 0 cycles gates, slot 1 ups —
            # and each consumer refills its slot with the NEXT layer's
            # same half ((s+2) % 2L), which wraps across passes exactly
            # like the w_down ring below.  Two half dots over the same
            # K contraction are bitwise the fused dot's column halves
            # (per-output-column f32 accumulation is independent), so
            # the emulator contract is untouched.
            wgu_hbm, wgu_buf, wgu_sem = wgu_stream
            rs = _rms_scale(h, eps)
            pltpu.make_async_copy(
                wgu_hbm.at[2 * l], wgu_buf.at[0], wgu_sem.at[0]
            ).wait()
            gate = _qmm(h, wgu_buf[0], s_refs["w_gu"][l][:, :F]) * rs
            pltpu.make_async_copy(
                wgu_hbm.at[(2 * l + 2) % (2 * L)], wgu_buf.at[0], wgu_sem.at[0]
            ).start()
            pltpu.make_async_copy(
                wgu_hbm.at[2 * l + 1], wgu_buf.at[1], wgu_sem.at[1]
            ).wait()
            up = _qmm(h, wgu_buf[1], s_refs["w_gu"][l][:, F:]) * rs
            pltpu.make_async_copy(
                wgu_hbm.at[(2 * l + 3) % (2 * L)], wgu_buf.at[1], wgu_sem.at[1]
            ).start()
            gated = jax.nn.silu(gate) * up
        if wd_stream is None:
            h = h + _qmm(gated, w_refs["w_down"][l], s_refs["w_down"][l])
        else:
            # Streamed w_down (the B=16 single-program tier): layer ``l``'s
            # slice was DMA'd into slot ``l % 2`` by its previous consumer
            # (or the kernel preamble); consume it, then refill the slot
            # with layer ``(l + 2) % L``'s slice — with L even that is
            # exactly the next slice this slot serves, both later in this
            # pass and across passes (after a full pass, slot 0 again holds
            # layer 0, slot 1 layer 1).  The refill enqueue is ordered
            # after the dot's reads by the WAR dependency on ``wd_buf``
            # (same single-slot pattern as the head buffer), and its
            # ~10 µs DMA hides under the following layers' compute.
            wd_hbm, wd_buf, wd_sem = wd_stream
            slot = l % 2
            pltpu.make_async_copy(
                wd_hbm.at[l], wd_buf.at[slot], wd_sem.at[slot]
            ).wait()
            h = h + _qmm(gated, wd_buf[slot], s_refs["w_down"][l])
            pltpu.make_async_copy(
                wd_hbm.at[(l + 2) % L], wd_buf.at[slot], wd_sem.at[slot]
            ).start()
    h_last = h.reshape(B, T, Dd)[:, T - 1, :]  # [B, Dd]
    return h_last * _rms_scale(h_last, eps)


def _make_kernel(
    config: CSMConfig,
    greedy: bool,
    head_dtype,
    B: int,
    head_slots: int = 2,
    head_scaled: bool = False,
    stream_down: bool = False,
    stream_gu: bool = False,
):
    dcfg = config.decoder
    eps = dcfg.rms_norm_eps
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128
    Dd = dcfg.hidden_size
    nkv, hd = dcfg.num_key_value_heads, dcfg.head_dim
    L = dcfg.num_hidden_layers
    lanes = min(Dd, 128)
    sub = Dd // lanes

    def kernel(
        temp_ref,  # VMEM (B, 1) f32 — per-row temperature
        topk_ref,  # VMEM (B, 1) int32 — per-row top-k
        forced_ref,  # VMEM (B, N) int32 — forced token per slot, -1 = sample
        x0_ref,  # VMEM (B, Dd) f32 — proj(last_h)
        c0lg_ref,  # VMEM (B, Va_pad) f32 — backbone c0 logits (bf16-rounded)
        wqkv, wo, wgu, wd,  # VMEM int8 [L, K, N] (fused, norm-folded)
        sqkv, so, sgu, sd,  # VMEM f32 [L, 1, N]
        cos_ref, sin_ref,  # VMEM f32 [P, hd]
        hs_hbm,  # ANY f32 [N-1, 1, Va_pad] head rescale (dummy unless head_scaled)
        gumbel_hbm,  # ANY f32 [N, B, Va_pad] — row i: codebook i's noise
        head_hbm,  # ANY [N-1, Dd, Va_pad]
        emb_hbm,  # ANY [rows, sub, lanes]
        samples_ref,  # out VMEM (B, N) int32
        head_buf,  # scratch VMEM (head_slots, Dd, Va_pad) head_dtype
        emb_buf,  # scratch VMEM (B, sub, lanes) emb dtype
        kv_k, kv_v,  # scratch VMEM (L, N, B*nkv*hd) bf16 — merged layout
        gum_buf,  # scratch VMEM (2, B, Va_pad) f32 — double-buffered noise
        hs_buf,  # scratch VMEM (head_slots, 1, Va_pad) f32 — streamed rescale
        head_sem,  # DMA sem (head_slots,)
        emb_sem,  # DMA sem (B,)
        gum_sem,  # DMA sem (2,)
        hs_sem,  # DMA sem (head_slots,)
        *stream_scratch,  # stream_down: wd_buf VMEM (2, F, Dd) int8 + wd_sem;
        # stream_gu additionally: wgu_buf VMEM (2, Dd, F) int8 + wgu_sem
    ):
        wgu_stream = None
        if stream_down and stream_gu:
            wd_buf, wd_sem, wgu_buf, wgu_sem = stream_scratch
            wd_stream = (wd, wd_buf, wd_sem)
            wgu_stream = (wgu, wgu_buf, wgu_sem)
        elif stream_down:
            wd_buf, wd_sem = stream_scratch
            wd_stream = (wd, wd_buf, wd_sem)
        else:
            wd_stream = None
        w_refs = dict(zip(_KERNEL_MATS, (wqkv, wo, wgu, wd)))
        s_refs = dict(zip(_KERNEL_MATS, (sqkv, so, sgu, sd)))
        temp = temp_ref[...]  # [B, 1]
        topk = topk_ref[...]  # [B, 1]

        # Head slice i and (int8 head) its f32 rescale row stream together:
        # the rescale rides its own small DMA into a per-slot buffer rather
        # than sitting in VMEM as an [N-1, 1, Va_pad] input indexed by a
        # traced loop counter — the row consumed is always the one the
        # slot's semaphore ordered, and the full table costs no VMEM.
        def _head_copies(slot, i):
            copies = [pltpu.make_async_copy(
                head_hbm.at[i], head_buf.at[slot], head_sem.at[slot]
            )]
            if head_scaled:
                copies.append(pltpu.make_async_copy(
                    hs_hbm.at[i], hs_buf.at[slot], hs_sem.at[slot]
                ))
            return copies

        def head_dma_start(slot, i):
            for c in _head_copies(slot, i):
                c.start()

        def head_dma_wait(slot, i):
            for c in _head_copies(slot, i):
                c.wait()

        # Gumbel noise rows stream from HBM, double-buffered two steps
        # ahead — keeping the [N, B, Va_pad] table OUT of VMEM (it alone
        # would be ~4.5 MB at B=16; the weights already occupy ~106 MB).
        def gum_dma(i):
            return pltpu.make_async_copy(
                gumbel_hbm.at[i], gum_buf.at[i % 2], gum_sem.at[i % 2]
            )

        def gum_row(i):
            """Wait codebook i's noise row and prefetch row i+2."""
            gum_dma(i).wait()
            row = gum_buf[i % 2]
            if isinstance(i, int):  # static index (c0 warm-up)
                if i + 2 < N:
                    gum_dma(i + 2).start()
            else:
                @pl.when(i + 2 < N)
                def _():
                    gum_dma(i + 2).start()
            return row

        def fetch_embeds(rows):
            """Data-dependent DMA of each stream's pre-projected embedding
            row; returns [B, Dd] f32."""
            for b in range(B):
                pltpu.make_async_copy(
                    emb_hbm.at[rows[b]], emb_buf.at[b], emb_sem.at[b]
                ).start()
            for b in range(B):
                pltpu.make_async_copy(
                    emb_hbm.at[rows[b]], emb_buf.at[b], emb_sem.at[b]
                ).wait()
            return emb_buf[:].astype(jnp.float32).reshape(B, Dd)

        # Zero the KV scratch (uninitialized VMEM may hold junk; masked
        # attention tolerates it but the emulator contract is zeros).
        kv_k[...] = jnp.zeros(kv_k.shape, kv_k.dtype)
        kv_v[...] = jnp.zeros(kv_v.shape, kv_v.dtype)

        head_dma_start(0, 0)
        gum_dma(0).start()
        gum_dma(1).start()
        if stream_gu:
            # Prime the w_gu ring first — layer 0's gate half (slice 0) is
            # consumed BEFORE its w_down slice, so its DMA should lead the
            # queue.  Slices 0 (gate) and 1 (up) land in slots 0 and 1.
            for slot in (0, 1):
                pltpu.make_async_copy(
                    wgu.at[slot], wgu_buf.at[slot], wgu_sem.at[slot]
                ).start()
        if stream_down:
            # Prime the w_down double buffer: layers 0 and 1 (the prefill
            # pass's first two consumers); every later slice is fetched by
            # the consumer that frees its slot (_decoder_pass).
            for slot in (0, 1):
                pltpu.make_async_copy(
                    wd.at[slot], wd_buf.at[slot], wd_sem.at[slot]
                ).start()

        col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        vcol = jax.lax.broadcasted_iota(jnp.int32, (B, Va_pad), 1)

        def apply_forced(ci, i):
            """Override row samples whose ``forced`` slot is >= 0 (the
            speculative-decode re-draft path: verified-prefix tokens are
            pinned so later draft steps condition on the exact prefix).
            ``i`` may be traced; column i is picked by a masked row-sum."""
            fi = jnp.sum(jnp.where(col == i, forced_ref[:], 0), axis=1)
            return jnp.where(fi >= 0, fi, ci)

        # c0: sampled IN-KERNEL from the backbone's logits — the semantics
        # (and, for bf16-rounded logits, the exact draw) of
        # ops.sampling.sample_topk with this frame's keys[0] noise.  Moving
        # it here takes the whole c0-sample -> embed -> prefill-build chain
        # off the XLA critical path (~0.5 ms of tiny serialized ops).
        lg0 = jnp.where(vcol < Va, c0lg_ref[:], NEG_INF)
        c0 = apply_forced(
            _sample_row(lg0, gum_row(0), temp, topk, greedy), 0
        )  # [B]
        samples0 = jnp.where(col == 0, c0[:, None], 0)

        # Decoder prefill: [proj(last_h); proj(embed(c0))] at positions 0..1
        # (reference modeling_csm.py:536-552); rows stream-major (b*2 + t).
        x1 = fetch_embeds(c0)  # codebook-0 offset is 0
        if B == 1:
            x_prefill = jnp.concatenate([x0_ref[:], x1], axis=0)
        else:
            rows2 = []
            for b in range(B):
                rows2.append(x0_ref[b : b + 1, :])
                rows2.append(x1[b : b + 1, :])
            x_prefill = jnp.concatenate(rows2, axis=0)
        h_last = _decoder_pass(
            x_prefill, 0, B, 2, dcfg, eps,
            w_refs, s_refs, cos_ref, sin_ref, kv_k, kv_v,
            wd_stream=wd_stream, wgu_stream=wgu_stream,
        )

        def classify(h_last, i):
            """Head matmul + sample for codebook ``i`` (head slice i-1)."""
            slot = 0 if head_slots == 1 else (i - 1) % 2
            head_dma_wait(slot, i - 1)
            # int8 head (head_scaled): W8A16 dot + f32 per-channel rescale;
            # bf16 head: plain dot in the head's own dtype.
            x = h_last.astype(jnp.bfloat16 if head_scaled else head_dtype)
            logits = jax.lax.dot_general(
                x, head_buf[slot],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [B, Va_pad]
            if head_scaled:
                logits = logits * hs_buf[slot]
            # Round through bf16 to mirror the XLA path's head-matmul output
            # dtype, keeping greedy decisions comparable across paths; mask
            # the zero-padded vocab lanes out of contention.
            logits = logits.astype(jnp.bfloat16).astype(jnp.float32)
            logits = jnp.where(vcol < Va, logits, NEG_INF)
            return apply_forced(
                _sample_row(logits, gum_row(i), temp, topk, greedy), i
            )

        def step(i, carry):  # i ∈ [1, N-2]: classify + advance the decoder
            h_last, samples = carry
            if head_slots == 2:
                head_dma_start(i % 2, i)  # i ≤ N-2 always has a next slice
            ci = classify(h_last, i)
            if head_slots == 1:
                # Single-buffered: start slice i only AFTER classify consumed
                # slice i-1 (the WAR dependency on head_buf orders the
                # enqueue after the dot's reads).  The ~5 µs slice DMA then
                # hides under the decoder pass below, so nothing is exposed.
                head_dma_start(0, i)
            samples = jnp.where(col == i, ci[:, None], samples)

            # Fetch the pre-projected embedding of each stream's ci
            # (codebook-i offset) and run one decoder step at position i+1.
            x = fetch_embeds(ci + i * Va)
            h_next = _decoder_pass(
                x, i + 1, B, 1, dcfg, eps, w_refs, s_refs,
                cos_ref, sin_ref, kv_k, kv_v,
                wd_stream=wd_stream, wgu_stream=wgu_stream,
            )
            return h_next, samples

        h_last, samples = jax.lax.fori_loop(1, N - 1, step, (h_last, samples0))
        # Final codebook: classification only — the reference also skips the
        # trailing decoder step (modeling_csm.py:562-576), so the 32nd pass
        # the loop used to run was pure waste (~3% of kernel time).
        c_last = classify(h_last, N - 1)
        samples_ref[:] = jnp.where(col == N - 1, c_last[:, None], samples)
        if stream_down:
            # The last pass's refills (layers 0 and 1, primed for a pass
            # that never runs) must be drained — a DMA still in flight at
            # kernel exit is an error.
            for slot in (0, 1):
                pltpu.make_async_copy(
                    wd.at[slot], wd_buf.at[slot], wd_sem.at[slot]
                ).wait()
        if stream_gu:
            # Same drain for the w_gu ring (slices 0 and 1 back in flight).
            for slot in (0, 1):
                pltpu.make_async_copy(
                    wgu.at[slot], wgu_buf.at[slot], wgu_sem.at[slot]
                ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("config", "greedy", "interpret", "stream_down", "stream_gu"),
)
def fused_decode_codebooks(
    qdec: dict,
    config: CSMConfig,
    x0: jnp.ndarray,  # [B, Dd] f32 — proj(last_h)
    c0_logits: jnp.ndarray,  # [B, Va] f32 (bf16-rounded backbone logits)
    gumbel: jnp.ndarray,  # [N, B, Va] f32 — row i: codebook i's noise
    temperature,  # scalar f32 or [B] per-row
    *,
    topk,  # int or [B] int32 per-row (dynamic: never triggers a recompile)
    greedy: bool,
    interpret: bool = False,
    stream_down: bool = False,
    stream_gu: bool = False,
    forced=None,  # [B, N] int32, -1 = sample (specdec re-draft); dynamic
) -> jnp.ndarray:
    """Run the fused kernel; samples ALL ``N`` codebooks (c0 included) and
    returns ``[B, N]`` int32.

    ``forced``: per-slot token overrides (>= 0 pins the slot to that token,
    -1 samples normally) — a DYNAMIC input, so the speculative-decode loop
    re-drafts through the SAME compiled program every round.

    ``stream_down=True`` selects the streamed-``w_down`` variant (see the
    constants block): identical math and outputs, ~17 MB less scoped VMEM —
    the tier that fits a single B=16 program.  Requires an even layer
    count (the 2-slot refill cycle's invariant).

    ``stream_gu=True`` (requires ``stream_down``) ALSO streams the fused
    gate‖up matrix as per-layer column halves — another ~48 MB of scoped
    VMEM freed, the tier that fits a single B=32 program.  Identical math
    and outputs (column-half dots accumulate bitwise like the fused dot)."""
    dcfg = config.decoder
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128
    Dd = dcfg.hidden_size
    L = dcfg.num_hidden_layers
    nkv, hd = dcfg.num_key_value_heads, dcfg.head_dim
    P = config.decoder_rope_positions
    head_dtype = qdec["audio_head"].dtype
    lanes = min(Dd, 128)
    sub = Dd // lanes
    B = x0.shape[0]
    gumbel = jnp.pad(
        gumbel.astype(jnp.float32), ((0, 0), (0, 0), (0, Va_pad - Va))
    )
    # bf16-round first: the 16-step bisection resolves exactly the top 16
    # bits, so the top-k cutoff is exact only on bf16-rounded logits (the
    # bf16 paths' head emits them rounded already; f32 params get the same
    # documented rounding here).  Idempotent for already-rounded inputs.
    c0_logits = bf16_round(c0_logits)
    c0_logits = jnp.pad(c0_logits, ((0, 0), (0, Va_pad - Va)))

    head_scaled = "head_scale" in qdec
    if stream_down and L % 2 != 0:
        raise ValueError(
            f"stream_down requires an even decoder layer count, got {L}"
        )
    if stream_gu and not stream_down:
        raise ValueError("stream_gu requires stream_down (the B=32 tier)")
    # Past the double-buffer-validated batch the head buffer drops to one
    # slot (start-after-consume) — kept for oversized direct callers; the
    # shipped paths chunk at MAX_VALIDATED_B so this stays 2.  The streamed
    # tier keeps both slots: w_down leaving VMEM pays for the second one
    # many times over.
    head_slots = 2 if (B <= MAX_VALIDATED_B or stream_down) else 1
    kernel = _make_kernel(
        config, greedy, head_dtype, B, head_slots, head_scaled, stream_down,
        stream_gu,
    )
    temp_v = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (B,)
    ).reshape(B, 1)
    topk_v = jnp.clip(
        jnp.broadcast_to(jnp.asarray(topk, jnp.int32).reshape(-1), (B,)),
        1, Va,
    ).reshape(B, 1)
    forced_v = (
        jnp.full((B, N), -1, jnp.int32)
        if forced is None
        else jnp.asarray(forced, jnp.int32).reshape(B, N)
    )
    hs = (
        qdec["head_scale"]
        if head_scaled
        else jnp.ones((1, 1, 128), jnp.float32)  # dummy, unread
    )

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    weights = [qdec["w"][m] for m in _KERNEL_MATS] + [
        qdec["s"][m] for m in _KERNEL_MATS
    ]
    w_specs = [vm] * len(_KERNEL_MATS)
    if stream_down:
        # w_down stays in HBM; the kernel streams per-layer slices through
        # a 2-slot VMEM ring (scratch below).
        w_specs[_KERNEL_MATS.index("w_down")] = any_
    if stream_gu:
        # w_gu stays in HBM too, re-laid-out as 2L half-slices [Dd, F]:
        # slice 2l = layer l's gate columns, 2l+1 = its up columns (the
        # ring order _decoder_pass consumes).
        gi = _KERNEL_MATS.index("w_gu")
        wgu_full = weights[gi]  # [L, Dd, 2F] int8
        F_gu = wgu_full.shape[-1] // 2
        weights[gi] = (
            wgu_full.reshape(L, Dd, 2, F_gu)
            .transpose(0, 2, 1, 3)
            .reshape(2 * L, Dd, F_gu)
        )
        w_specs[gi] = any_
    in_specs = (
        [vm, vm, vm, vm, vm]  # temp, topk, forced, x0, c0 logits
        + w_specs
        + [vm] * len(_KERNEL_MATS)  # scales
        + [vm] * 2  # rope tables
        # head rescale (streamed per-row), gumbel, head, emb tables
        + [any_] * 4
    )

    vmem_bytes = sum(int(w.size * w.dtype.itemsize) for w in weights)
    if stream_down:
        wd = qdec["w"]["w_down"]
        F_down = wd.shape[1]
        vmem_bytes -= int(wd.size * wd.dtype.itemsize)
        vmem_bytes += 2 * F_down * Dd  # the int8 double buffer
        # The streamed tier runs bigger batches, whose block-diagonal
        # attention temporaries scale ~B² — measured 106.3 MiB of actual
        # stack at B=8 against the resident form's 10 MB slack estimate.
        # The freed w_down residency is headroom by construction; spend
        # half of it on the limit so the Mosaic stack allocator is never
        # the binding constraint below the physical ~118.7 MiB cap.
        vmem_bytes += 12 * 1024 * 1024
    if stream_gu:
        gi = _KERNEL_MATS.index("w_gu")
        wgu_arr = weights[gi]
        vmem_bytes -= int(wgu_arr.size * wgu_arr.dtype.itemsize)
        F_gu = wgu_arr.shape[-1]
        vmem_bytes += 2 * Dd * F_gu  # the int8 half-slice ring
        # B=32 doubles the B-scaled stack again (the failed stream_down-
        # only compile recorded 48 MB of spill slots); spend more of the
        # freed w_gu residency on allocator headroom.  The B=32 program's
        # measured stack is scheduling-sensitive (99.24 MB inside a serving
        # step_many scan vs ~93 MB standalone — the forced-token input +
        # surrounding while/scan shifted liveness), so the allowance
        # carries real margin; physical cap ~118.7 MiB still binds above.
        vmem_bytes += 36 * 1024 * 1024
    vmem_bytes += (
        head_slots * Dd * Va_pad * jnp.dtype(head_dtype).itemsize
    )  # head_buf
    vmem_bytes += 2 * B * Va_pad * 4  # gum_buf (noise streams from HBM)
    vmem_bytes += head_slots * Va_pad * 4  # hs_buf (rescale rows stream too)
    # Temporaries, KV scratch (bf16), and the small VMEM inputs (c0 logits
    # [B, Va_pad] + rope tables); the gumbel table itself stays in HBM so
    # batch growth costs VMEM only through the [B, ...] activations.
    vmem_bytes += 10 * 1024 * 1024

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
        in_specs=in_specs,
        out_specs=vm,
        scratch_shapes=[
            pltpu.VMEM((head_slots, Dd, Va_pad), head_dtype),
            pltpu.VMEM((B, sub, lanes), qdec["proj_emb"].dtype),
            # KV scratch rows = N (32): positions 0..31 are the only ones
            # ever written (the final codebook is classify-only, no trailing
            # decoder step), rows past the write index are causally masked,
            # and 32 rows are sublane-exact where 33 would pad to 40 —
            # 512 KB of scoped VMEM back at B=16.
            pltpu.VMEM((L, N, B * nkv * hd), jnp.bfloat16),
            pltpu.VMEM((L, N, B * nkv * hd), jnp.bfloat16),
            pltpu.VMEM((2, B, Va_pad), jnp.float32),
            pltpu.VMEM((head_slots, 1, Va_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((head_slots,)),
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((head_slots,)),
        ] + (
            [
                pltpu.VMEM((2, qdec["w"]["w_down"].shape[1], Dd), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if stream_down
            else []
        ) + (
            [
                pltpu.VMEM(
                    (2, Dd, qdec["w"]["w_gu"].shape[-1] // 2), jnp.int8
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if stream_gu
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 127 * 1024 * 1024),
        ),
        interpret=interpret,
    )(
        temp_v,
        topk_v,
        forced_v,
        x0.astype(jnp.float32),
        c0_logits,
        *weights,
        qdec["cos"], qdec["sin"],
        hs,
        gumbel,
        qdec["audio_head"],
        qdec["proj_emb"],
    )


# ---------------------------------------------------------------------------
# Emulator (pure JAX oracle — op-for-op identical math)
# ---------------------------------------------------------------------------


def emulate_decode_codebooks(
    qdec: dict,
    config: CSMConfig,
    x0: jnp.ndarray,  # [1, Dd] f32 — proj(last_h), single stream
    c0_logits: jnp.ndarray,  # [1, Va] f32
    gumbel: jnp.ndarray,  # [N, 1, Va] f32
    temperature,
    *,
    topk,
    greedy: bool,
    return_logits: bool = False,
    forced=None,  # [1, N] int32, -1 = sample (mirrors the kernel input)
) -> jnp.ndarray:
    """Pure-JAX replica of the kernel's exact arithmetic (same quantized
    weights, same fp32 accumulation, same bisection top-k, same in-kernel
    c0 sampling).  Used as the test oracle; also runs on CPU.  Returns
    ``[1, N]`` int32 (with ``return_logits``: also the per-codebook
    bf16-rounded logits ``[N, Va_pad]`` — row 0 is the c0 input — for
    diagnosing near-tie argmax flips against the hardware kernel)."""
    dcfg = config.decoder
    eps = dcfg.rms_norm_eps
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Va_pad = qdec["audio_head"].shape[-1]
    Dd = dcfg.hidden_size
    L = dcfg.num_hidden_layers
    nq, nkv, hd = dcfg.num_attention_heads, dcfg.num_key_value_heads, dcfg.head_dim
    P = config.decoder_rope_positions
    head_dtype = qdec["audio_head"].dtype
    gumbel = jnp.pad(
        gumbel.astype(jnp.float32), ((0, 0), (0, 0), (0, Va_pad - Va))
    )
    # bf16-round first: the 16-step bisection resolves exactly the top 16
    # bits, so the top-k cutoff is exact only on bf16-rounded logits (the
    # bf16 paths' head emits them rounded already; f32 params get the same
    # documented rounding here).  Idempotent for already-rounded inputs.
    c0_logits = bf16_round(c0_logits)
    c0_logits = jnp.pad(c0_logits, ((0, 0), (0, Va_pad - Va)))
    vcol = jnp.arange(Va_pad)[None, :]

    # bf16 KV storage, mirroring the kernel's scratch (and the XLA path's
    # bf16 KV cache); attention math upcasts at the dots (_attend_merged).
    kv_k = jnp.zeros((L, nkv, P, hd), jnp.bfloat16)
    kv_v = jnp.zeros((L, nkv, P, hd), jnp.bfloat16)
    cos, sin = qdec["cos"], qdec["sin"]
    proj_emb_flat = qdec["proj_emb"].reshape(qdec["proj_emb"].shape[0], Dd)

    def dec_pass(kv_k, kv_v, x, pos0, T):
        h = x.astype(jnp.float32)
        c = jax.lax.dynamic_slice_in_dim(cos, pos0, T, 0)
        s = jax.lax.dynamic_slice_in_dim(sin, pos0, T, 0)
        for l in range(L):
            # Norm weights live inside the quantized matrices; the rs
            # scalar applies to the matmul OUTPUT (kernel-identical math).
            rs = _rms_scale(h, eps)
            q = (_qmm(h, qdec["w"]["wq"][l], qdec["s"]["wq"][l]) * rs).reshape(T, nq, hd)
            k = (_qmm(h, qdec["w"]["wk"][l], qdec["s"]["wk"][l]) * rs).reshape(T, nkv, hd)
            v = (_qmm(h, qdec["w"]["wv"][l], qdec["s"]["wv"][l]) * rs).reshape(T, nkv, hd)
            q = _rope_f32(q, c, s)
            k = _rope_f32(k, c, s)
            kv_k = jax.lax.dynamic_update_slice(
                kv_k, k.transpose(1, 0, 2)[None, :, :, :].astype(jnp.bfloat16),
                (l, 0, pos0, 0),
            )
            kv_v = jax.lax.dynamic_update_slice(
                kv_v, v.transpose(1, 0, 2)[None, :, :, :].astype(jnp.bfloat16),
                (l, 0, pos0, 0),
            )
            attn = _attend(q, kv_k[l], kv_v[l], pos0)
            h = h + _qmm(attn, qdec["w"]["wo"][l], qdec["s"]["wo"][l])
            rs = _rms_scale(h, eps)
            gate = _qmm(h, qdec["w"]["w_gate"][l], qdec["s"]["w_gate"][l]) * rs
            up = _qmm(h, qdec["w"]["w_up"][l], qdec["s"]["w_up"][l]) * rs
            h = h + _qmm(
                jax.nn.silu(gate) * up, qdec["w"]["w_down"][l], qdec["s"]["w_down"][l]
            )
        h_last = h[T - 1 : T, :]
        return kv_k, kv_v, h_last * _rms_scale(h_last, eps)

    # Normalize temp/topk to the kernel's per-row [1, 1] vectors (B=1 here).
    temp_v = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (1,)
    ).reshape(1, 1)
    topk_v = jnp.clip(
        jnp.broadcast_to(jnp.asarray(topk, jnp.int32).reshape(-1), (1,)),
        1, Va,
    ).reshape(1, 1)

    if forced is None:
        forced = jnp.full((1, N), -1, jnp.int32)
    forced = jnp.asarray(forced, jnp.int32).reshape(1, N)

    def apply_forced(ci, i):
        return jnp.where(forced[:, i] >= 0, forced[:, i], ci)

    # c0: in-kernel sampling semantics (padded lanes masked, raw logits)
    lg0 = jnp.where(vcol < Va, c0_logits, NEG_INF)
    c0 = apply_forced(_sample_row(lg0, gumbel[0], temp_v, topk_v, greedy), 0)
    x_prefill = jnp.concatenate(
        [x0.astype(jnp.float32), proj_emb_flat[c0[0]][None, :].astype(jnp.float32)],
        axis=0,
    )
    kv_k, kv_v, h_last = dec_pass(kv_k, kv_v, x_prefill, 0, 2)

    head_scaled = "head_scale" in qdec
    samples = [c0[0]]
    all_logits = [lg0[0]]
    for i in range(1, N):
        # Same head math as the kernel's classify(): int8 head (head_scaled)
        # is a W8A16 dot + f32 per-channel rescale; bf16 head a plain dot.
        xh = h_last.astype(jnp.bfloat16 if head_scaled else head_dtype)
        logits = jax.lax.dot_general(
            xh, qdec["audio_head"][i - 1],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if head_scaled:
            logits = logits * qdec["head_scale"][i - 1]
        logits = bf16_round(logits)
        logits = jnp.where(vcol < Va, logits, NEG_INF)
        all_logits.append(logits[0])
        ci = apply_forced(
            _sample_row(logits, gumbel[i], temp_v, topk_v, greedy), i
        )
        samples.append(ci[0])
        x = proj_emb_flat[ci[0] + i * Va][None, :]
        kv_k, kv_v, h_last = dec_pass(kv_k, kv_v, x, i + 1, 1)
    out = jnp.stack(samples)[None, :].astype(jnp.int32)
    if return_logits:
        return out, jnp.stack(all_logits)
    return out


# ---------------------------------------------------------------------------
# Frame-level wrapper (drop-in alternative to generation.decode_frame)
# ---------------------------------------------------------------------------


def build_frame_gumbel(config, rng, B: int, greedy: bool) -> jnp.ndarray:
    """One frame's Gumbel-noise table ``[N, B, Va]`` — row ``i`` is codebook
    ``i``'s noise, drawn from the SAME ``jax.random`` keys the XLA path
    would consume (scalar ``rng`` = joint draws; ``[B]`` key array =
    per-stream draws, each row identical to its solo run).  Shared by the
    fused kernel and the speculative-decode verify loop so a frame's draws
    are fixed once per frame regardless of how many draft rounds run."""
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    if rng is None:
        rng = jax.random.key(0)
    per_stream = jnp.ndim(rng) > 0
    if greedy:
        return jnp.zeros((N, B, Va), jnp.float32)
    if per_stream:
        keys_b = jax.vmap(lambda k: jax.random.split(k, N))(rng)  # [B, N]
        # Row b draws from its own key stream — identical to the B=1
        # per-stream path (gumbel(k, (1, Va)) rows).
        gumbel = jax.vmap(
            jax.vmap(lambda k: jax.random.gumbel(k, (1, Va), jnp.float32)[0])
        )(keys_b)  # [B, N, Va]
        return jnp.swapaxes(gumbel, 0, 1)  # [N, B, Va]
    keys = jax.random.split(rng, N)
    return jax.vmap(
        lambda k: jax.random.gumbel(k, (B, Va), jnp.float32)
    )(keys)


def decode_frame_fused(
    params: dict,
    qdec: dict,
    config: CSMConfig,
    last_h: jnp.ndarray,  # [B, D]
    c0_logits: jnp.ndarray,  # [B, Va]
    rng: Optional[jax.Array],
    temperature,
    topk,
    greedy: bool,
    *,
    interpret: Optional[bool] = None,
    greedy_rows: Optional[jnp.ndarray] = None,
    forced: Optional[jnp.ndarray] = None,  # [B, N] int32, -1 = sample
) -> jnp.ndarray:
    """Sample one frame's 32 codebooks per stream using the fused kernel.

    ALL sampling — c0 included — runs in-kernel: the Gumbel noise for
    codebook ``i`` is drawn from keys[i] exactly as the XLA path would
    (c0's in-kernel bisection top-k equals :func:`..sampling.sample_topk`
    bitwise on the backbone's bf16-rounded logits), so sampled-mode draws
    line up across implementations.  Moving c0's sample + embedding fetch
    + prefill build into the kernel removed ~0.5 ms of tiny serialized XLA
    ops from the frame's critical path.  ``rng`` may be one key (joint
    draws, like the reference's batched sampler) or a ``[B]`` key array
    (per-stream draws: each row matches its solo run — the
    continuous-batching serving contract).

    Per-request serving extras: ``temperature`` / ``topk`` may be ``[B]``
    arrays, and ``greedy_rows`` (``[B]`` bool) makes the marked rows
    deterministic — implemented as top-1 with that row's Gumbel noise
    zeroed, which is exactly the greedy argmax (first-occurrence ties).
    All three are DYNAMIC kernel inputs: mixing per-request parameters
    never triggers a recompile.
    """
    B = last_h.shape[0]
    if interpret is None:
        # No Mosaic backend on CPU (tests): fall back to interpreter mode.
        interpret = jax.default_backend() == "cpu"
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size

    gumbel = build_frame_gumbel(config, rng, B, greedy)

    # Per-row parameter vectors (dynamic kernel inputs).
    temp_b = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (B,)
    )
    topk_b = jnp.broadcast_to(jnp.asarray(topk, jnp.int32).reshape(-1), (B,))
    if greedy_rows is not None:
        gr = jnp.asarray(greedy_rows).reshape(B)
        topk_b = jnp.where(gr, 1, topk_b)
        gumbel = gumbel * (1.0 - gr.astype(jnp.float32))[None, :, None]

    x0 = last_h @ params["projection"]  # [B, Dd]
    x0 = x0.astype(jnp.float32)
    c0lg = c0_logits.astype(jnp.float32)
    # Single-program caps (see the constants block).  Up to 8 rows the
    # fully-resident program runs (lowest latency); 9..16 rows run ONE
    # streamed-w_down program (w_down leaves VMEM — identical math, and
    # ~40 % faster than two resident chunks since the 31-step serial
    # latency is paid once); past that, sequential chunks.
    head_scaled = "head_scale" in qdec
    cap = MAX_VALIDATED_B_1SLOT if head_scaled else MAX_VALIDATED_B
    even_layers = config.decoder.num_hidden_layers % 2 == 0
    # The streamed tiers are hardware-validated ONLY with the int8 head
    # (scripts/check_fused_hw.py 16/32 run head_bits=8; a bf16-head streamed
    # program carries a 2x larger head buffer and has never been compiled
    # against this backend's 118.7 MiB scoped-VMEM cap).  bf16-head batches
    # past the resident cap therefore take the validated sequential-chunk
    # path instead of an unproven single program.
    streams_ok = even_layers and head_scaled
    stream_cap = MAX_VALIDATED_B_STREAMDOWN if streams_ok else cap
    # The stream-everything tier (w_gu also ringed out of VMEM) serves one
    # program up to B=32; past it, sequential chunks of the largest
    # validated program.
    gu_cap = max(MAX_VALIDATED_B_STREAMGU, stream_cap) if streams_ok else cap

    N_cb = config.audio_num_codebooks
    forced_b = (
        jnp.full((B, N_cb), -1, jnp.int32)
        if forced is None
        else jnp.asarray(forced, jnp.int32).reshape(B, N_cb)
    )

    def one(x0, c0lg, gumbel, temp_b, topk_b, forced_b):
        b = x0.shape[0]
        return fused_decode_codebooks(
            qdec, config, x0, c0lg, gumbel, temp_b,
            topk=topk_b, greedy=greedy, interpret=interpret,
            stream_down=b > cap,
            stream_gu=b > stream_cap,
            forced=forced_b,
        )  # [b, N]

    if B <= gu_cap:
        return one(x0, c0lg, gumbel, temp_b, topk_b, forced_b)
    # Batches past the kernel's VMEM-validated caps split into sequential
    # chunks.  The noise table was built at full B
    # above, so every row's draw is bitwise what the joint/per-stream XLA
    # semantics prescribe — slicing it keeps each chunk row-identical to
    # its solo run.  Cost per extra chunk = one weight reload into VMEM
    # (~111 MB ≈ 0.14 ms at 819 GB/s) + the serial 31-step latency; far
    # cheaper than the XLA codebook loop, which re-reads the weights from
    # HBM on all 31 steps.
    outs = []
    for s in range(0, B, gu_cap):
        e = min(s + gu_cap, B)
        outs.append(one(
            x0[s:e], c0lg[s:e], gumbel[:, s:e], temp_b[s:e], topk_b[s:e],
            forced_b[s:e],
        ))
    return jnp.concatenate(outs, axis=0)  # [B, N]

"""CSM model assembly: embeddings, heads, forward pass, and training losses.

Faithful to the reference ``CSMModel`` (``modeling_csm.py:192-482``) while
being TPU-native (static shapes, functional params, fp32 loss accumulation):

- Separate text ``[text_vocab, D]`` and shared audio ``[32*2051, D]``
  embedding tables with the ``codebook_index * audio_vocab_size`` offset
  trick (``modeling_csm.py:222-225, 247-259``).
- Frame embedding = mask-weighted **sum** of the 33 token embeddings
  (``modeling_csm.py:327-334``).
- Backbone loss: causally shifted CE on codebook-0 labels, fp32
  (``modeling_csm.py:374-385``).
- Decoder loss: frames whose 32 audio labels are all present are gathered,
  conditioned on the backbone hidden at **t−1** (including the reference's
  wrap-around for a valid frame at t=0 — torch ``h[..., -1]`` negative
  indexing, ``modeling_csm.py:401-403``), run through the intra-frame
  decoder as ``[hidden; cb0..cb31]`` (33 tokens), classified per-codebook
  via ``einsum('fcd,cdv->fcv', hidden[:,1:32], audio_head)`` and averaged
  over non-ignored targets (``modeling_csm.py:394-461``).

Static-shape departure (SURVEY §7 "hard parts"): the reference gathers a
data-dependent number of valid frames; here the gather is padded/truncated to
a **static** ``max_decoder_frames`` with zero-weight slots, which keeps the
training step jittable.  With ``max_decoder_frames >= true count`` the loss
is bit-comparable to the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from csm_tpu.config import CSMConfig
from csm_tpu.models import llama
from csm_tpu.models.llama import KVCache
from csm_tpu.ops.rope import compute_rope_table


@struct.dataclass
class CSMOutput:
    """Result structure mirroring the reference ``CSMOutput``
    (``modeling_csm.py:30-49``)."""

    last_hidden_state: Optional[jnp.ndarray] = None  # [B, D] final position
    logits: Optional[jnp.ndarray] = None  # [B, audio_vocab] c0 logits, final position
    cache: Optional[KVCache] = None
    samples: Optional[jnp.ndarray] = None  # [B, 32] from generate_frame
    loss: Optional[jnp.ndarray] = None
    backbone_loss: Optional[jnp.ndarray] = None
    decoder_loss: Optional[jnp.ndarray] = None
    # Non-ignored target counts behind each loss mean — lets callers
    # aggregate token-weighted CE across ragged batches (HF Trainer eval
    # semantics, ``/root/reference/train.py:303-326``).
    backbone_targets: Optional[jnp.ndarray] = None
    decoder_targets: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: CSMConfig, dtype=jnp.float32) -> dict:
    """Initialize the full CSM parameter pytree.

    Linear/embedding weights ~ N(0, 0.02); linear weights stored input-major
    ``[in, out]``; ``audio_head`` keeps the reference layout
    ``[num_codebooks-1, decoder_dim, audio_vocab]`` (``modeling_csm.py:235-240``).
    """
    kb, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    D = config.backbone.hidden_size
    Dd = config.decoder.hidden_size
    Va = config.audio_vocab_size

    def normal(k, shape):
        return (0.02 * jax.random.normal(k, shape, jnp.float32)).astype(dtype)

    return {
        "backbone": llama.init_params(kb, config.backbone, dtype),
        "decoder": llama.init_params(kd, config.decoder, dtype),
        "text_embeddings": normal(k1, (config.text_vocab_size, D)),
        "audio_embeddings": normal(k2, (config.audio_embedding_rows, D)),
        "projection": normal(k3, (D, Dd)),
        "codebook0_head": normal(k4, (D, Va)),
        "audio_head": normal(k5, (config.audio_num_codebooks - 1, Dd, Va)),
    }


def rope_tables(config: CSMConfig):
    """(cos, sin) tables for both stacks.  Pure numpy precompute — inside a
    jit trace these become compile-time constants."""
    return {
        "backbone": compute_rope_table(config.backbone, config.max_seq_len),
        "decoder": compute_rope_table(config.decoder, config.decoder_rope_positions),
    }


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def embed_audio(params: dict, config: CSMConfig, codebook: int, tokens: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup for one codebook, offset by ``codebook * audio_vocab``
    into the shared table (``modeling_csm.py:247-259``)."""
    return jnp.take(
        params["audio_embeddings"], tokens + codebook * config.audio_vocab_size, axis=0
    )


def embed_frames(
    params: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, S, 33] int
    attention_mask: Optional[jnp.ndarray],  # [B, S, 33] or None
) -> jnp.ndarray:
    """Fused 33-way masked embedding-sum → one vector per frame ``[B, S, D]``.

    Equivalent to the reference's embed → mask-multiply → sum over the token
    axis (``modeling_csm.py:261-282, 327-334``), but never materializes the
    ``[B, S, 33, D]`` intermediate's text/audio concat — audio and text
    contributions are reduced separately and added.
    """
    N = config.audio_num_codebooks
    offsets = jnp.arange(N, dtype=input_ids.dtype) * config.audio_vocab_size
    audio_ids = input_ids[..., :N] + offsets  # [B, S, N]
    audio_emb = jnp.take(params["audio_embeddings"], audio_ids, axis=0)  # [B,S,N,D]
    text_emb = jnp.take(params["text_embeddings"], input_ids[..., N], axis=0)  # [B,S,D]
    if attention_mask is not None:
        m = attention_mask.astype(audio_emb.dtype)
        audio_sum = jnp.einsum("bsnd,bsn->bsd", audio_emb, m[..., :N])
        text_part = text_emb * m[..., N][..., None]
    else:
        audio_sum = audio_emb.sum(axis=2)
        text_part = text_emb
    return audio_sum + text_part


# ---------------------------------------------------------------------------
# Loss helpers
# ---------------------------------------------------------------------------


def _masked_ce(
    logits: jnp.ndarray,  # [N, V]
    targets: jnp.ndarray,  # [N] int, -100 = ignore
    weight: Optional[jnp.ndarray] = None,  # [N] extra 0/1 weight
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean cross-entropy over non-ignored targets, fp32 (torch
    ``CrossEntropyLoss(ignore_index=-100)`` semantics).

    Deliberate deviation: with zero non-ignored targets torch returns NaN
    (0/0); this returns 0.0 so a fully-masked batch cannot poison training.
    """
    valid = targets != -100
    if weight is not None:
        valid = valid & (weight > 0)
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    n = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    return jnp.where(n > 0, total / n, 0.0), n


def _select_decoder_frames(
    valid: jnp.ndarray, max_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape selection of (up to) ``max_frames`` flat indices of valid
    frames, earliest first; padded slots get weight 0."""
    flat = valid.reshape(-1)
    n = flat.shape[0]
    # Sort key: valid frames keep their original order and precede invalid.
    key = jnp.where(flat, 0, n) + jnp.arange(n)
    order = jnp.argsort(key)
    idx = order[:max_frames]
    return idx, flat[idx]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def backbone_forward(
    params: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, S, 33]
    attention_mask: Optional[jnp.ndarray],  # [B, S, 33]
    *,
    cache: Optional[KVCache] = None,
    positions: Optional[jnp.ndarray] = None,
    flash_prefill: bool = False,
    qbb: Optional[dict] = None,
    use_flash: bool = True,
    remat: bool = False,
    remat_policy: str = "nothing",
    sp_mesh=None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Embed-sum + backbone stack.  Returns full hidden ``[B, S, D]``.

    ``qbb``: int8 backbone weights (:mod:`csm_tpu.ops.quant`) — the W8A16
    decode-step path (callers pass it for per-frame steps, not prefill).

    ``use_flash=False`` forces the XLA attention path (the flash kernel is
    differentiable via its Pallas backward since round 3; this switch
    remains as an escape hatch / A-B lever).

    ``remat``: rematerialize the layer scan under ``jax.grad``
    (:func:`csm_tpu.models.llama.forward`); the train step sets it.

    Per-frame attention validity is the collapsed 33-token mask
    ``any(mask) > 0`` (``modeling_csm.py:337-342``).  Positions default to
    sequential frame indices (HF ``cache_position`` semantics — left padding
    is numbered, then masked out of attention).

    ``flash_prefill``: the cached call is a prefill starting at cache index
    0 — eligible shapes then use the Pallas flash kernel instead of
    materializing the ``[B, 1, 1, S, T]`` bias.
    """
    from csm_tpu.ops.attention import flash_eligible, sp_flash_eligible

    B, S, _ = input_ids.shape
    h = embed_frames(params, config, input_ids, attention_mask)
    if attention_mask is not None:
        frame_valid = attention_mask.sum(axis=-1) > 0  # [B, S]
    else:
        frame_valid = jnp.ones((B, S), jnp.bool_)

    rope = compute_rope_table(config.backbone, config.max_seq_len)
    hd = config.backbone.head_dim

    if cache is None:
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        bb = config.backbone
        if sp_mesh is not None and dict(
            zip(sp_mesh.axis_names, sp_mesh.devices.shape)
        ).get("seq", 1) == 1:
            sp_mesh = None  # no sequence sharding — ordinary dispatch
        if use_flash and sp_flash_eligible(
            sp_mesh, B, S, bb.num_attention_heads, bb.num_key_value_heads, hd
        ):
            # Sequence-parallel flash: the kernel runs under shard_map with
            # a per-shard query offset (frame axis sharded over mesh "seq").
            bias, flash_valid = None, frame_valid
        elif use_flash and sp_mesh is None and flash_eligible(S, S, hd):
            bias, flash_valid = None, frame_valid
        else:
            # Includes the SP-but-ineligible case: a pallas_call cannot be
            # partitioned over the sharded frame axis, so fall back to XLA
            # attention (the partitioner inserts the K/V all-gathers)
            # rather than replicating the kernel.
            bias, flash_valid, sp_mesh = (
                llama.make_causal_bias(frame_valid, S), None, None,
            )
        hidden, _ = llama.forward(
            params["backbone"], config.backbone, h,
            rope_table=rope, positions=positions, attn_bias=bias, cache=None,
            flash_key_valid=flash_valid, qlayers=qbb, remat=remat,
            remat_policy=remat_policy, sp_mesh=sp_mesh,
        )
        return hidden, None

    # Cached path: write this chunk's validity into the cache window, then
    # attend over the full static window.  ``cache.index`` may be a scalar
    # (all streams aligned) or a per-stream ``[B]`` vector (continuous
    # batching: each serving slot at its own depth).
    start = jnp.asarray(cache.index)
    if positions is None:
        positions = jnp.broadcast_to(
            start.reshape(-1, 1) + jnp.arange(S, dtype=jnp.int32), (B, S)
        )
    if start.ndim == 0:
        key_valid = jax.lax.dynamic_update_slice(cache.valid, frame_valid, (0, start))
    else:
        key_valid = jax.vmap(
            lambda v, f, s: jax.lax.dynamic_update_slice(v, f, (s,))
        )(cache.valid, frame_valid, start)
    cache = cache.replace(valid=key_valid)
    if flash_prefill and flash_eligible(S, cache.max_len, hd):
        bias, flash_valid = None, key_valid
    else:
        bias, flash_valid = llama.make_causal_bias(key_valid, S, q_offset=start), None
    hidden, new_cache = llama.forward(
        params["backbone"], config.backbone, h,
        rope_table=rope, positions=positions, attn_bias=bias, cache=cache,
        flash_key_valid=flash_valid, qlayers=qbb,
    )
    return hidden, new_cache


def decoder_forward_full(
    params: dict, config: CSMConfig, decoder_inputs: jnp.ndarray
) -> jnp.ndarray:
    """Uncached intra-frame decoder on ``[F, 33, decoder_dim]`` inputs with
    sequential positions 0..32 (training path, ``modeling_csm.py:439-441``)."""
    rope = compute_rope_table(config.decoder, config.decoder_rope_positions)
    return llama.forward_uncached(
        params["decoder"], config.decoder, decoder_inputs, rope_table=rope
    )


def forward_decode_streamed(
    params: dict,
    qsb: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, 1, 33]
    attention_mask: Optional[jnp.ndarray],
    cache: KVCache,
) -> CSMOutput:
    """One-frame decode step through the streamed-weight backbone kernel
    (:mod:`csm_tpu.ops.bb_kernel`): embed-sum + 16 layers + final norm + c0
    head as ONE Pallas program pinned to the HBM-bandwidth floor.

    The kernel is pure — it returns the new K/V rows and this function
    scatters them into the cache (scalar or per-stream ``cache.index``).
    """
    from csm_tpu.ops.bb_kernel import bb_decode_step

    B, S, _ = input_ids.shape
    h0 = embed_frames(params, config, input_ids, attention_mask)[:, 0, :]
    start = jnp.asarray(cache.index)
    starts = (
        jnp.broadcast_to(start.reshape(()), (B,)) if start.ndim == 0 else start
    )
    rope = compute_rope_table(config.backbone, config.max_seq_len)
    # mode="clip": a finished/idle serving slot keeps stepping past the
    # table ("garbage steps"); the default OOB fill is NaN, and a single
    # NaN K-row would spread through the kernel's merged window into EVERY
    # stream's attention (0·NaN).  Clipped positions yield finite garbage
    # that stays confined to the dead slot's own block.
    cos = jnp.take(rope[0], starts, axis=0, mode="clip")  # [B, hd]
    sin = jnp.take(rope[1], starts, axis=0, mode="clip")
    bias_w = jnp.where(cache.valid, 0.0, llama.NEG_INF).astype(jnp.float32)

    nh, c0_logits, nk, nv = bb_decode_step(
        qsb, config, h0, cos, sin, bias_w, cache.k, cache.v,
        interpret=jax.default_backend() == "cpu",
    )

    nk = nk[:, :, None].astype(cache.k.dtype)  # [L, B, 1, nkv, hd]
    nv = nv[:, :, None].astype(cache.v.dtype)
    # XLA-path validity contract (backbone_forward): a frame whose 33-wide
    # attention mask is all-zero is recorded INVALID so later steps never
    # attend its K/V.
    if attention_mask is not None:
        one = (attention_mask.sum(axis=2) > 0).reshape(B, 1)
    else:
        one = jnp.ones((B, 1), jnp.bool_)
    if start.ndim == 0:
        k = jax.lax.dynamic_update_slice(cache.k, nk, (0, 0, start, 0, 0))
        v = jax.lax.dynamic_update_slice(cache.v, nv, (0, 0, start, 0, 0))
        valid = jax.lax.dynamic_update_slice(cache.valid, one, (0, start))
    else:
        upd = jax.vmap(
            lambda c, n, i: jax.lax.dynamic_update_slice(c, n, (0, i, 0, 0)),
            in_axes=(1, 1, 0), out_axes=1,
        )
        k = upd(cache.k, nk, starts)
        v = upd(cache.v, nv, starts)
        valid = jax.vmap(
            lambda vv, o, i: jax.lax.dynamic_update_slice(vv, o, (i,))
        )(cache.valid, one, starts)
    new_cache = cache.replace(k=k, v=v, valid=valid, index=cache.index + 1)
    dtype = params["projection"].dtype
    return CSMOutput(
        last_hidden_state=nh.astype(dtype),
        logits=c0_logits,
        cache=new_cache,
    )


def forward(
    params: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, S, 33]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, S, 33]
    labels: Optional[jnp.ndarray] = None,  # [B, S, 33], -100 = ignore
    *,
    cache: Optional[KVCache] = None,
    positions: Optional[jnp.ndarray] = None,
    max_decoder_frames: Optional[int] = None,
    return_all_logits: bool = False,
    last_index: Optional[jnp.ndarray] = None,
    flash_prefill: bool = False,
    qbb: Optional[dict] = None,
    qsb: Optional[dict] = None,
    use_flash: bool = True,
    remat: bool = False,
    remat_policy: str = "nothing",
    decoder_frame_sharding=None,
    sp_mesh=None,
) -> CSMOutput:
    """Full forward pass with optional training losses
    (``modeling_csm.py:292-482``).

    Args:
        max_decoder_frames: static cap on decoder-loss frames (see module
            docstring).  Defaults to ``B*S`` (exact but memory-heavy); the
            training loop passes ``~B*S/amortization_ratio``.
        last_index: position to report as the "final" hidden/logits (the
            last *real* frame when the input is right-padded to a shape
            bucket); defaults to the last row.
    """
    B, S, _ = input_ids.shape
    N = config.audio_num_codebooks

    from csm_tpu.ops.bb_kernel import (
        MAX_VALIDATED_B as _qsb_max_b,
        MAX_VALIDATED_B_EXACT as _qsb_max_b_exact,
    )

    if (
        qsb is not None
        and cache is not None
        and S == 1
        # hardware-validated batch caps (bb_kernel; the exact bf16 tier's
        # larger ring entries are validated to a smaller B)
        and B <= (_qsb_max_b_exact if "nw" in qsb else _qsb_max_b)
        and labels is None
        and not return_all_logits
        and positions is None
    ):
        return forward_decode_streamed(
            params, qsb, config, input_ids, attention_mask, cache
        )

    hidden, new_cache = backbone_forward(
        params, config, input_ids, attention_mask, cache=cache,
        positions=positions, flash_prefill=flash_prefill, qbb=qbb,
        use_flash=use_flash, remat=remat, remat_policy=remat_policy,
        sp_mesh=sp_mesh,
    )

    head = params["codebook0_head"]
    if last_index is None:
        last_h = hidden[:, -1, :]
    else:
        last_h = jax.lax.dynamic_index_in_dim(hidden, last_index, axis=1, keepdims=False)
    c0_logits_last = last_h @ head

    loss = backbone_loss = decoder_loss = None
    backbone_targets = decoder_targets = None
    c0_all = None
    if labels is not None or return_all_logits:
        c0_all = hidden @ head  # [B, S, Va]

    if labels is not None:
        # --- backbone (codebook-0) loss: shifted CE, fp32 -----------------
        shift_logits = c0_all[:, :-1, :].reshape(-1, config.audio_vocab_size)
        shift_labels = labels[:, 1:, 0].reshape(-1)
        backbone_loss, backbone_targets = _masked_ce(shift_logits, shift_labels)

        # --- decoder (codebooks 1..N-1) loss ------------------------------
        if max_decoder_frames is None:
            max_decoder_frames = B * S
        audio_labels = labels[..., :N]
        valid = jnp.all(audio_labels != -100, axis=-1)  # [B, S]
        idx, weight = _select_decoder_frames(valid, max_decoder_frames)
        b_idx, t_idx = idx // S, idx % S

        # Backbone hidden at t−1 — the state that *predicted* frame t.  The
        # reference's `(t-1)` gather uses torch negative indexing, so t=0
        # wraps to S−1 (``modeling_csm.py:401-403``); `% S` reproduces that.
        prev_h = hidden[b_idx, (t_idx - 1) % S]  # [F, D]
        frame_codebooks = input_ids[b_idx, t_idx, :N]  # [F, N]
        frame_labels = audio_labels[b_idx, t_idx]  # [F, N]

        proj = params["projection"]
        offsets = jnp.arange(N, dtype=frame_codebooks.dtype) * config.audio_vocab_size
        cb_emb = jnp.take(
            params["audio_embeddings"], frame_codebooks + offsets, axis=0
        )  # [F, N, D]
        dec_in = jnp.concatenate(
            [(prev_h @ proj)[:, None, :], cb_emb @ proj], axis=1
        )  # [F, 1+N, Dd]

        if decoder_frame_sharding is not None:
            # Under a mesh, the gathered decoder frames lose the batch/seq
            # sharding of the grid they came from (the [B*S] -> [F] gather
            # flattens it), and the SPMD partitioner then materializes the
            # decoder-loss activations REPLICATED — measured 532 MiB f32
            # of MLP intermediates per device at 1B/S=2048/F=129, the
            # single largest activation in the sequence-parallel train
            # step (scripts/check_sp_memory.py).  The frames are
            # independent rows, so constrain them to shard over the given
            # mesh axes; everything downstream (decoder stack, heads, CE)
            # inherits the F-axis sharding.
            from jax.sharding import PartitionSpec

            dec_in = jax.lax.with_sharding_constraint(
                dec_in, PartitionSpec(decoder_frame_sharding, None, None)
            )

        dec_hidden = decoder_forward_full(params, config, dec_in)
        cb_hidden = dec_hidden[:, 1:N, :]  # [F, N-1, Dd]
        cb_logits = jnp.einsum(
            "fcd,cdv->fcv", cb_hidden, params["audio_head"],
            preferred_element_type=jnp.float32,
        )  # [F, N-1, Va]

        targets = frame_labels[:, 1:]  # [F, N-1]
        w = jnp.broadcast_to(weight[:, None], targets.shape)
        decoder_loss, decoder_targets = _masked_ce(
            cb_logits.reshape(-1, config.audio_vocab_size),
            targets.reshape(-1),
            w.reshape(-1),
        )
        loss = backbone_loss + decoder_loss

    return CSMOutput(
        last_hidden_state=last_h,
        logits=c0_all if return_all_logits else c0_logits_last,
        cache=new_cache,
        loss=loss,
        backbone_loss=backbone_loss,
        decoder_loss=decoder_loss,
        backbone_targets=backbone_targets,
        decoder_targets=decoder_targets,
    )

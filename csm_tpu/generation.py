"""Autoregressive generation: KV-cached backbone decode + intra-frame
decoder sampling (reference ``modeling_csm.py:484-702``).

The reference's hot loop costs ~65 kernel launches per 80 ms frame (1
backbone step + 31 decoder steps + 32 sampling ops, SURVEY §3.1).  Here the
**entire frame** — backbone decode step, c0 sampling, decoder prefill, the
31-step intra-frame loop (``lax.scan``), and the next-frame input build — is
a single jitted XLA program (:func:`frame_step`), and :func:`generate` wraps
prefill + a ``lax.while_loop`` over frames so a whole utterance is ONE device
program: zero per-frame dispatch overhead.

Static-shape contract (SURVEY §7 "hard parts"):

- the backbone KV cache is a fixed ``max_seq_len`` window with a validity
  mask; prefill inputs are right-padded to shape buckets,
- the decoder's 33-slot KV cache is rebuilt inside each frame step,
- ``max_new_frames`` bounds the output buffer; early stop is a ``while_loop``
  condition, not a shape change.

Stopping (``modeling_csm.py:662-663``): the reference breaks when a frame is
all-zero across the **whole batch** (``stop_mode="batch"``, the
parity-compatible default); ``stop_mode="stream"`` upgrades this to
per-stream stopping for batched serving (each stream freezes independently —
a capability the reference lacks).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm, llama
from csm_tpu.models.llama import KVCache
from csm_tpu.ops.rope import compute_rope_table
from csm_tpu.ops.sampling import sample_topk, sample_topk_batch


def _is_per_stream(rng) -> bool:
    """A ``[B]`` key array selects per-stream RNG semantics (each stream's
    draws depend only on its own key — solo/batched token parity)."""
    return rng is not None and jnp.ndim(rng) > 0


def _split_keys(rng):
    """Split a scalar key or a ``[B]`` key array into (next, use)."""
    if _is_per_stream(rng):
        pair = jax.vmap(lambda k: jax.random.split(k))(rng)  # [B, 2]
        return pair[:, 0], pair[:, 1]
    return jax.random.split(rng)


# ---------------------------------------------------------------------------
# Intra-frame decoder
# ---------------------------------------------------------------------------


def _decoder_step(
    params: dict,
    config: CSMConfig,
    x: jnp.ndarray,  # [B, S, Dd] projected inputs
    pos_start: jnp.ndarray | int,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One cached decoder forward over ``x`` (S tokens).  Returns the last
    position's hidden state ``[B, Dd]`` and the updated tiny cache."""
    B, S, _ = x.shape
    rope = compute_rope_table(config.decoder, config.decoder_rope_positions)
    positions = jnp.broadcast_to(
        pos_start + jnp.arange(S, dtype=jnp.int32), (B, S)
    )
    valid = jax.lax.dynamic_update_slice(
        cache.valid, jnp.ones((B, S), jnp.bool_), (0, cache.index)
    )
    bias = llama.make_causal_bias(valid, S, q_offset=cache.index)
    cache = cache.replace(valid=valid)
    h, new_cache = llama.forward(
        params["decoder"], config.decoder, x,
        rope_table=rope, positions=positions, attn_bias=bias, cache=cache,
    )
    return h[:, -1, :], new_cache


def decode_frame(
    params: dict,
    config: CSMConfig,
    last_h: jnp.ndarray,  # [B, D] backbone hidden at the final position
    c0_logits: jnp.ndarray,  # [B, audio_vocab]
    rng: Optional[jax.Array],
    temperature,  # scalar, or [B] per-request (serving)
    topk,  # int, or [B] int32 per-request (serving)
    greedy: bool,
    qdec: Optional[dict] = None,
    greedy_rows: Optional[jnp.ndarray] = None,
    specdec: bool = False,
) -> jnp.ndarray:
    """Sample all 32 codebooks of one frame (``modeling_csm.py:522-577``).

    c0 from the backbone head; decoder prefilled with
    ``[proj(last_h); proj(embed(c0))]`` at positions 0..1; codebooks 1..31
    sampled sequentially via ``lax.scan`` — each step classifies with
    ``audio_head[i-1]``, re-embeds with the codebook-i offset, and feeds one
    projected token at position i+1 (the final codebook skips the trailing
    decoder step, as the reference does).  Returns ``[B, 32]`` int32.

    ``qdec``: a bundle from
    :func:`csm_tpu.ops.fused_decoder.prepare_fused_decoder` switches the
    whole loop to the VMEM-resident int8 Pallas kernel (one program up to
    MAX_VALIDATED_B rows, then sequential chunks, dispatched up to
    MAX_CHUNKED_B; ~3×
    faster on a v5e chip, quantized numerics — see that module's docs).
    """
    B = last_h.shape[0]
    # The fused kernel is latency-bound, so batching rows through it is
    # near-free UP TO one f32 sublane tile (8 rows).  9..16 rows run as
    # ONE streamed-w_down program (w_down leaves VMEM for a 2-slot DMA
    # ring; ~2.95 ms at B=16 vs ~4.4 ms for two resident chunks); larger
    # batches split into sequential streamed chunks.  The XLA loop's
    # ~8.5 ms weight-bound floor is flat in B, so the kernel wins up to
    # MAX_CHUNKED_B — beyond that fall back to the XLA path.
    from csm_tpu.ops.fused_decoder import MAX_CHUNKED_B as _qdec_max_b

    if specdec:
        # EXACT tier: the int8 kernel only DRAFTS; one teacher-forced bf16
        # XLA pass per round verifies, so the emitted tokens are the bf16
        # path's own (ops.specdec).  Batches past the draft kernel's
        # validated cap fall through to the plain XLA loop below — equally
        # exact, just slower.
        from csm_tpu.ops.specdec import MAX_SPECDEC_B, decode_frame_specdec

        if qdec is not None and B <= MAX_SPECDEC_B:
            return decode_frame_specdec(
                params, qdec, config, last_h, c0_logits, rng,
                temperature, topk, greedy, greedy_rows=greedy_rows,
            )
    elif qdec is not None and B <= _qdec_max_b:
        from csm_tpu.ops.fused_decoder import decode_frame_fused

        return decode_frame_fused(
            params, qdec, config, last_h, c0_logits, rng,
            temperature, topk, greedy, greedy_rows=greedy_rows,
        )
    N = config.audio_num_codebooks
    proj = params["projection"]

    if rng is None:
        rng = jax.random.key(0)
    if _is_per_stream(rng):
        keys = jax.vmap(lambda k: jax.random.split(k, N))(rng)  # [B, N]
        keys = jnp.swapaxes(keys, 0, 1)  # [N, B]
        draw = lambda ks, lg: sample_topk_batch(
            ks, lg, topk, temperature, greedy, greedy_rows=greedy_rows
        )
    else:
        if greedy_rows is not None:
            raise ValueError(
                "greedy_rows requires per-stream keys (a [B] rng array)"
            )
        keys = jax.random.split(rng, N)
        draw = lambda k, lg: sample_topk(k, lg, topk, temperature, greedy)

    c0 = draw(keys[0], c0_logits)  # [B]
    c0_embed = csm.embed_audio(params, config, 0, c0)  # [B, D]

    dec_cache = KVCache.create(
        config.decoder, B, config.decoder_rope_positions, dtype=last_h.dtype
    )
    prefill = jnp.stack([last_h, c0_embed], axis=1) @ proj  # [B, 2, Dd]
    h_last, dec_cache = _decoder_step(params, config, prefill, 0, dec_cache)

    def body(carry, xs):
        h_last, dec_cache = carry
        head_i, offset, pos, key = xs
        ci_logits = h_last @ head_i  # [B, Va]
        ci = draw(key, ci_logits)  # [B]
        ci_embed = jnp.take(params["audio_embeddings"], ci + offset, axis=0)
        h_next, dec_cache = _decoder_step(
            params, config, (ci_embed @ proj)[:, None, :], pos, dec_cache
        )
        return (h_next, dec_cache), ci

    # Codebooks 1..N-2 each also advance the decoder; N-1 is classified from
    # the last scan state without a trailing step (``modeling_csm.py:562-576``).
    offsets = (jnp.arange(1, N - 1, dtype=jnp.int32)) * config.audio_vocab_size
    xs = (
        params["audio_head"][: N - 2],
        offsets,
        jnp.arange(2, N, dtype=jnp.int32),
        keys[1 : N - 1],
    )
    (h_last, _), mid = jax.lax.scan(body, (h_last, dec_cache), xs)

    c_last_logits = h_last @ params["audio_head"][N - 2]
    c_last = draw(keys[N - 1], c_last_logits)

    return jnp.concatenate(
        [c0[:, None], mid.T.astype(jnp.int32), c_last[:, None]], axis=1
    )


# ---------------------------------------------------------------------------
# Frame-level generation
# ---------------------------------------------------------------------------


def generate_frame(
    params: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, S, 33]
    attention_mask: Optional[jnp.ndarray],
    *,
    cache: Optional[KVCache] = None,
    rng: Optional[jax.Array] = None,
    temperature=1.0,
    topk=50,
    greedy: bool = False,
    true_len: Optional[jnp.ndarray] = None,
    flash_prefill: bool = False,
    qdec: Optional[dict] = None,
    qbb: Optional[dict] = None,
    qsb: Optional[dict] = None,
    greedy_rows: Optional[jnp.ndarray] = None,
    specdec: bool = False,
) -> csm.CSMOutput:
    """Generate one frame's 32 codebooks (reference
    ``generate_frame``, ``modeling_csm.py:484-589``).

    ``true_len``: when ``input_ids`` is right-padded to a shape bucket, the
    number of real frames; the cache index is pinned there so subsequent
    decode steps overwrite the bucket padding.

    ``temperature`` / ``topk`` may be ``[B]`` per-request vectors and
    ``greedy_rows`` a ``[B]`` bool mask (with per-stream ``rng``) — the
    per-request serving path; see :func:`decode_frame`.
    """
    out = csm.forward(
        params, config, input_ids, attention_mask, cache=cache,
        last_index=None if true_len is None else true_len - 1,
        flash_prefill=flash_prefill, qbb=qbb, qsb=qsb,
    )
    new_cache = out.cache
    if new_cache is not None and true_len is not None:
        start = cache.index if cache is not None else 0
        new_cache = new_cache.replace(index=start + true_len)
    samples = decode_frame(
        params, config, out.last_hidden_state, out.logits,
        rng, temperature, topk, greedy, qdec=qdec, greedy_rows=greedy_rows,
        specdec=specdec,
    )
    return csm.CSMOutput(
        last_hidden_state=out.last_hidden_state,
        logits=out.logits,
        cache=new_cache,
        samples=samples,
    )


def _next_frame_inputs(config: CSMConfig, new_frame: jnp.ndarray):
    """Build the next step's ``[B, 1, 33]`` inputs: 32 sampled tokens + zero
    text column, mask 1 on audio / 0 on text (``modeling_csm.py:675-690``)."""
    B = new_frame.shape[0]
    W = config.frame_width
    ids = jnp.concatenate(
        [new_frame, jnp.zeros((B, 1), new_frame.dtype)], axis=1
    )[:, None, :]
    mask = jnp.zeros((B, 1, W), jnp.float32).at[:, :, : config.audio_num_codebooks].set(1.0)
    return ids, mask


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "max_new_frames", "topk", "greedy", "stop_on_all_zeros",
        "stop_mode", "cache_len", "specdec",
    ),
)
def generate_compiled(
    params: dict,
    config: CSMConfig,
    input_ids: jnp.ndarray,  # [B, S_bucket, 33] right-padded prompt
    attention_mask: jnp.ndarray,  # [B, S_bucket, 33]
    true_len: jnp.ndarray,  # scalar int32: real prompt frames
    rng: jax.Array,
    *,
    max_new_frames: int,
    temperature: float | jnp.ndarray = 1.0,
    topk: int = 50,
    greedy: bool = False,
    stop_on_all_zeros: bool = True,
    stop_mode: str = "batch",
    cache_len: Optional[int] = None,
    qdec: Optional[dict] = None,
    qbb: Optional[dict] = None,
    qsb: Optional[dict] = None,
    specdec: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-utterance generation as one device program: prefill + a
    ``while_loop`` of frame steps (reference loop: ``modeling_csm.py:640-690``).

    Returns ``(frames [B, max_new_frames, 32], n_frames [B])``; rows past a
    stream's ``n_frames`` are zero.  Wrap with :func:`generate` for the
    reference's dynamically-sized return.
    """
    B, S, W = input_ids.shape
    if cache_len is None:
        # Rounded to a multiple of 128 so the flash prefill can block the
        # cache window (the mask block's minor dim must be 128-aligned);
        # the extra slots stay masked invalid.
        cache_len = min(config.max_seq_len, S + max_new_frames)
        cache_len = ((cache_len + 127) // 128) * 128
    dtype = params["backbone"]["final_norm"].dtype

    cache = KVCache.create(config.backbone, B, cache_len, dtype=dtype)
    rng, k0 = _split_keys(rng)
    out = generate_frame(
        params, config, input_ids, attention_mask,
        cache=cache, rng=k0, temperature=temperature, topk=topk, greedy=greedy,
        true_len=true_len, flash_prefill=True, qdec=qdec, specdec=specdec,
    )

    frames_buf = jnp.zeros((B, max_new_frames, config.audio_num_codebooks), jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)
    n_frames = jnp.zeros((B,), jnp.int32)

    def process(new_frame, done, n_frames, frames_buf, step):
        frame_zero = jnp.all(new_frame == 0, axis=1)  # [B]
        if stop_on_all_zeros:
            if stop_mode == "batch":
                # Reference semantics: break (without appending) only when
                # EVERY stream emitted all zeros this step.
                stop_now = jnp.all(frame_zero)
                append = ~stop_now & ~done
                new_done = done | stop_now
            else:
                append = ~done & ~frame_zero
                new_done = done | frame_zero
        else:
            append = ~done
            new_done = done
        write = jnp.where(append[:, None], new_frame, 0)
        frames_buf = jax.lax.dynamic_update_slice(
            frames_buf, write[:, None, :], (0, step, 0)
        )
        n_frames = n_frames + append.astype(jnp.int32)
        return new_done, n_frames, frames_buf

    done, n_frames, frames_buf = process(out.samples, done, n_frames, frames_buf, 0)

    def cond(carry):
        step, done, *_ = carry
        return (step < max_new_frames) & ~jnp.all(done)

    def body(carry):
        step, done, n_frames, frames_buf, prev_frame, cache, rng = carry
        ids, mask = _next_frame_inputs(config, prev_frame)
        rng, k = _split_keys(rng)
        # Per-frame decode steps may use the W8A16 backbone (the prefill above
        # stays bf16 — prompt conditioning keeps full precision).
        out = generate_frame(
            params, config, ids, mask,
            cache=cache, rng=k, temperature=temperature, topk=topk, greedy=greedy,
            qdec=qdec, qbb=qbb, qsb=qsb, specdec=specdec,
        )
        done, n_frames, frames_buf = process(
            out.samples, done, n_frames, frames_buf, step
        )
        return (step + 1, done, n_frames, frames_buf, out.samples, out.cache, rng)

    carry = (jnp.int32(1), done, n_frames, frames_buf, out.samples, out.cache, rng)
    _, done, n_frames, frames_buf, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return frames_buf, n_frames


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def _pad_to_bucket(ids, mask, cap: Optional[int] = None):
    """Right-pad ``[B, S, 33]`` numpy ids/mask to the next prompt-length
    bucket (zero ids, zero mask — masked frames never attend), optionally
    clamping the bucket to ``cap``.  Returns ``(ids, mask, S, Sb)``.
    Shared by the serving admission/prefix paths so their padding rules
    can't drift apart."""
    import numpy as np

    B, S, W = ids.shape
    Sb = _bucket(S)
    if cap is not None:
        Sb = min(Sb, cap)
    if Sb > S:
        ids = np.concatenate([ids, np.zeros((B, Sb - S, W), ids.dtype)], 1)
        mask = np.concatenate([mask, np.zeros((B, Sb - S, W), mask.dtype)], 1)
    return ids, mask, S, Sb


def generate(
    params: dict,
    config: CSMConfig,
    input_ids,
    attention_mask,
    max_new_frames: int = 100,
    temperature: float = 1.0,
    topk: int = 50,
    use_cache: bool = True,  # accepted for API parity; always cached
    stop_on_all_zeros: bool = True,
    *,
    rng: Optional[jax.Array] = None,
    greedy: bool = False,
    stop_mode: str = "batch",
    qdec: Optional[dict] = None,
    qbb: Optional[dict] = None,
    qsb: Optional[dict] = None,
    specdec: bool = False,
):
    """Reference-compatible ``generate`` (``modeling_csm.py:591-702``):
    returns ``[B, n_frames, 32]`` (possibly ``[B, 0, 32]``).

    Host-side wrapper: right-pads the prompt to a shape bucket (bounding jit
    recompiles to one per bucket), invokes the single-program
    :func:`generate_compiled`, and trims the static output buffer to the
    generated frame count.
    """
    import numpy as np

    del use_cache  # the compiled path always carries the KV cache
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask, np.float32)
    B, S, W = ids.shape
    Sb = _bucket(S)
    if Sb > S:
        ids = np.concatenate([ids, np.zeros((B, Sb - S, W), ids.dtype)], axis=1)
        mask = np.concatenate([mask, np.zeros((B, Sb - S, W), mask.dtype)], axis=1)
    if rng is None:
        rng = jax.random.key(0)

    frames, n_frames = generate_compiled(
        params, config, jnp.asarray(ids), jnp.asarray(mask),
        jnp.int32(S), rng,
        max_new_frames=max_new_frames, temperature=temperature, topk=topk,
        greedy=greedy, stop_on_all_zeros=stop_on_all_zeros, stop_mode=stop_mode,
        qdec=qdec, qbb=qbb, qsb=qsb, specdec=specdec,
    )
    n = int(np.max(np.asarray(n_frames))) if stop_mode == "stream" else int(n_frames[0])
    return np.asarray(frames)[:, :n, :]

"""EXACT speculative decode of the intra-frame codebook loop.

The north-star metric (BASELINE.md:21-24) demands >=125 frames/s WITH greedy
token parity against the reference's bf16 decode path.  The parity-exact XLA
codebook loop re-reads the decoder's 222 MB of bf16 weights on each of the
31 sequential steps (~6.9 GB/frame, an ~8.5 ms HBM floor); the fused int8
kernel (:mod:`csm_tpu.ops.fused_decoder`) is 4x faster but quantized.  This
module gets BOTH: the int8 kernel DRAFTS all 32 codebooks (weights
VMEM-resident, ~2 ms), then ONE teacher-forced bf16 XLA pass over the whole
frame VERIFIES them — reading the bf16 weights exactly ONCE (~0.5 ms).
Accepted tokens are the bf16 verify pass's own tokens:

- the verify pass computes, at every position ``i``, the bf16 decoder's
  logits GIVEN the draft prefix ``< i`` — for the verified prefix that IS
  the exact autoregressive state;
- each verified token is the same deterministic function of those logits
  the XLA path applies (temperature -> top-k -> Gumbel-max with this
  frame's precomputed noise rows; greedy = first-occurrence argmax);
- a mismatch at position ``m`` yields the exact token at ``m`` (its prefix
  was verified), the tail is re-drafted with the exact prefix FORCED into
  the int8 kernel (a dynamic input — no recompile), and the loop repeats.
  Every round extends the verified prefix by >=1, so the loop terminates
  in <=31 rounds and its output is IDENTICAL to decoding with the verify
  pass alone — speculative decoding's standard exactness argument, applied
  intra-frame (reference loop: ``/root/reference/modeling_csm.py:555-576``).
  Parity with the INCREMENTAL per-step XLA loop is then an empirical
  question of teacher-forced-vs-incremental last-ulp accumulation (see the
  Numerics note below) — gated at 100% on sharpened logits, never assumed.

Cost model (CSM-1B, one v5e): draft ~2.1 ms + verify ~0.5 ms per round;
expected rounds = 1 + E[#draft mismatches].  On real (sharpened) weights the
int8 draft agrees with bf16 on ~all tokens, so a frame costs ~2.6 ms — vs
the exact XLA loop's ~8.5 ms.  On random-init weights (near-tie logits
everywhere) agreement collapses and the loop degrades toward the XLA loop's
cost times the round count — the tier's THROUGHPUT is weight-dependent by
construction, which the bench reports honestly (its agreement/rounds
numbers ride trained weights; see scripts/train_agreement_hw.py).

Numerics note: the verify pass is plain XLA on the bf16 parameters — the
same code path (:func:`csm_tpu.models.llama.forward_uncached`) the training
loss uses.  A teacher-forced T=32 forward and the incremental T=1 loop may
still differ in final-ulp f32 accumulation (different dot shapes); on
sharpened logits that never flips a pick, and the hardware agreement gate
(KERNEL_CHECKS ``specdec_*``) pins it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.config import CSMConfig
from csm_tpu.models import llama
from csm_tpu.ops.fused_decoder import (
    MAX_VALIDATED_B,
    _sample_row,
    bf16_round,
    build_frame_gumbel,
    decode_frame_fused,
)
from csm_tpu.ops.rope import compute_rope_table

# Largest batch the speculative tier serves: the draft rides the fused
# kernel's fully-resident single program (lowest latency, hardware-validated
# cap) and the verify pass is shape-agnostic XLA.  Bigger batches fall back
# to the plain XLA codebook loop in generation.decode_frame — which is
# equally exact, just slower.
MAX_SPECDEC_B = MAX_VALIDATED_B


def verify_codebooks(
    params: dict,
    config: CSMConfig,
    x0: jnp.ndarray,  # [B, Dd] f32 (bf16-valued) — proj(last_h)
    tokens: jnp.ndarray,  # [B, N] int32 — draft (col 0 = c0, already exact)
    gumbel: jnp.ndarray,  # [N, B, Va] f32 — this frame's noise table
    temp_v: jnp.ndarray,  # [B, 1] f32
    topk_v: jnp.ndarray,  # [B, 1] int32
    greedy: bool,
) -> jnp.ndarray:
    """One teacher-forced bf16 decoder pass over the frame: returns, for
    every codebook ``i >= 1``, the bf16 path's token GIVEN the draft prefix
    ``< i`` (``[B, N]`` int32; column 0 passes ``tokens[:, 0]`` through).

    Mirrors the incremental XLA loop's math (``generation.decode_frame``):
    inputs are ``[x0, proj(embed(c_0)), ..., proj(embed(c_{N-2}))]`` at
    positions 0..N-1, the decoder stack runs once over all positions
    (:func:`llama.forward_uncached` — causal attention makes position i's
    hidden depend only on the prefix), and position ``i`` classifies with
    ``audio_head[i-1]`` (reference ``modeling_csm.py:555-576``).  The
    bf16 weights are read from HBM exactly ONCE.
    """
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    B = x0.shape[0]
    proj = params["projection"]
    dtype = proj.dtype

    offsets = jnp.arange(N - 1, dtype=jnp.int32) * Va
    emb = jnp.take(
        params["audio_embeddings"], tokens[:, : N - 1] + offsets[None, :],
        axis=0,
    )  # [B, N-1, D]
    x = jnp.concatenate(
        [x0[:, None, :].astype(dtype), (emb @ proj).astype(dtype)], axis=1
    )  # [B, N, Dd] — position i feeds codebook i-1's embedding

    rope = compute_rope_table(config.decoder, config.decoder_rope_positions)
    h = llama.forward_uncached(
        params["decoder"], config.decoder, x, rope_table=rope
    )  # [B, N, Dd] (final-normed, as the incremental path's step outputs)

    # Position i's logits for codebook i (head slice i-1); bf16 head matmul
    # like the incremental path's ``h_last @ audio_head[i-1]``.
    lg = jnp.einsum("bcd,cdv->cbv", h[:, 1:N], params["audio_head"])  # [N-1, B, Va]
    lg = bf16_round(lg.astype(jnp.float32))

    def draw(lg_i, gum_i):
        return _sample_row(lg_i, gum_i, temp_v, topk_v, greedy)  # [B]

    exact_mid = jax.vmap(draw)(lg, gumbel[1:N])  # [N-1, B]
    return jnp.concatenate(
        [tokens[:, :1], exact_mid.T.astype(jnp.int32)], axis=1
    )  # [B, N]


def decode_frame_specdec(
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
    greedy_rows: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    return_rounds: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample one frame's 32 codebooks with EXACT bf16-path tokens via
    draft(int8 kernel) -> verify(one bf16 XLA pass) -> re-draft rounds.

    Same call contract as :func:`..fused_decoder.decode_frame_fused`
    (per-stream ``rng``, per-row ``temperature``/``topk``, ``greedy_rows``).
    ``return_rounds`` additionally returns the number of draft rounds the
    ``while_loop`` ran (``[]`` int32 scalar) for diagnostics/benches.
    """
    B = last_h.shape[0]
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size

    gumbel = build_frame_gumbel(config, rng, B, greedy)  # [N, B, Va]
    temp_b = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (B,)
    )
    topk_b = jnp.broadcast_to(jnp.asarray(topk, jnp.int32).reshape(-1), (B,))
    if greedy_rows is not None:
        gr = jnp.asarray(greedy_rows).reshape(B)
        topk_b = jnp.where(gr, 1, topk_b)
        gumbel = gumbel * (1.0 - gr.astype(jnp.float32))[None, :, None]
    temp_v = temp_b.reshape(B, 1)
    topk_v = jnp.clip(topk_b, 1, Va).reshape(B, 1)

    x0 = (last_h @ params["projection"]).astype(jnp.float32)  # bf16-valued
    c0lg = bf16_round(c0_logits.astype(jnp.float32))

    # c0 comes from the backbone's (exact-path) logits: the same
    # deterministic draw the XLA path makes — computed here once and FORCED
    # into every draft round.
    c0 = _sample_row(c0lg, gumbel[0], temp_v, topk_v, greedy)  # [B]

    col = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    tokens0 = jnp.zeros((B, N), jnp.int32).at[:, 0].set(c0)
    verified0 = jnp.ones((B,), jnp.int32)  # c0 is exact by construction

    def draft_fn(forced):
        return decode_frame_fused(
            params, qdec, config, last_h, c0_logits, rng,
            temperature, topk, greedy, greedy_rows=greedy_rows,
            interpret=interpret, forced=forced,
        )  # [B, N]

    def cond(carry):
        _, verified, _ = carry
        return jnp.any(verified < N)

    def body(carry):
        tokens, verified, rounds = carry
        forced = jnp.where(col < verified[:, None], tokens, -1)
        draft = draft_fn(forced)
        exact = verify_codebooks(
            params, config, x0, draft, gumbel, temp_v, topk_v, greedy
        )
        # Leading run of agreement (forced prefix agrees by construction;
        # checked anyway — it costs nothing and catches contract drift).
        match = (exact == draft) | (col < verified[:, None])
        pref = jnp.cumprod(match.astype(jnp.int32), axis=1)  # [B, N]
        vk = jnp.sum(pref, axis=1)  # [B] — first mismatch index, or N
        # Position vk's prefix is fully verified, so ITS exact token is
        # final too; the unverified tail keeps the draft (re-drafted next
        # round with the longer forced prefix).
        tokens_new = jnp.where(col == vk[:, None], exact, draft)
        verified_new = jnp.minimum(vk + 1, N)
        return tokens_new, verified_new, rounds + 1

    tokens, _, rounds = jax.lax.while_loop(
        cond, body, (tokens0, verified0, jnp.int32(0))
    )
    if return_rounds:
        return tokens, rounds
    return tokens

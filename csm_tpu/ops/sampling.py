"""Top-k sampling for codebook generation.

Reference semantics (``modeling_csm.py:179-189``): divide logits by
temperature, keep top-k (rest → −inf), softmax, then draw via the
exponential-race trick (``argmax(probs / q)``, ``q ~ Exp(1)``) — which is
exactly Gumbel-max sampling.  The reference's softmax∘log_softmax double
application is the identity (SURVEY §7 "numerical parity") and is simplified
away here.

TPU-first: everything is pure ``jax.random`` under jit — the Gumbel-max draw
is ``argmax(masked_logits + gumbel)``, which avoids materializing the
probability vector and is fully fused by XLA.  ``topk=1`` or
``temperature=0`` degenerate to deterministic argmax (the greedy-parity
contract vs the torch reference).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def topk_mask(logits: jnp.ndarray, topk: int) -> jnp.ndarray:
    """Mask all but the top-k entries of the last axis to a large negative.

    Ties at the k-th value are *kept* (same as the reference's
    ``logits < kth_val`` filter at ``modeling_csm.py:183-185``).  ``topk``
    is clamped to the vocab size (the reference's ``torch.topk`` would
    raise instead).
    """
    topk = min(topk, logits.shape[-1])
    kth = jax.lax.top_k(logits, topk)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def sample_topk_logits(
    logits: jnp.ndarray, topk: int, temperature: float | jnp.ndarray
) -> jnp.ndarray:
    """Temperature-scale + top-k filter; returns filtered logits ready for a
    Gumbel-max draw."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    return topk_mask(logits, topk)


def sample_topk(
    key: Optional[jax.Array],
    logits: jnp.ndarray,
    topk: int,
    temperature: float | jnp.ndarray,
    greedy: bool = False,
) -> jnp.ndarray:
    """Draw one token per row from the top-k filtered distribution.

    Args:
        key: PRNG key (ignored when ``greedy``).
        logits: ``[..., vocab]``.
        greedy: deterministic argmax (used for token-parity testing; the
            reference achieves the same with ``topk=1``).

    Returns ``[...]`` int32 samples.
    """
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    filtered = sample_topk_logits(logits, topk, temperature)
    gumbel = jax.random.gumbel(key, filtered.shape, jnp.float32)
    return jnp.argmax(filtered + gumbel, axis=-1).astype(jnp.int32)


def sample_topk_batch(
    keys: jax.Array,  # [B] PRNG keys
    logits: jnp.ndarray,  # [B, vocab]
    topk: int,
    temperature: float | jnp.ndarray,
    greedy: bool = False,
) -> jnp.ndarray:
    """Per-stream draws: row ``b`` consumes ONLY ``keys[b]`` and is bitwise
    identical to a standalone ``sample_topk(keys[b], logits[b:b+1], ...)``
    call.  This is what makes continuously-batched serving reproduce each
    request's solo token stream (the joint-key form cannot: its noise for
    row ``b`` depends on the batch size and position)."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def one(k, row):
        return sample_topk(k, row[None, :], topk, temperature, False)[0]

    return jax.vmap(one)(keys, logits)

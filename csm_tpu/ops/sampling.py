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
import numpy as _np

NEG_INF = -1e9


def topk_mask(logits: jnp.ndarray, topk) -> jnp.ndarray:
    """Mask all but the top-k entries of the last axis to a large negative.

    Ties at the k-th value are *kept* (same as the reference's
    ``logits < kth_val`` filter at ``modeling_csm.py:183-185``).  ``topk``
    is clamped to the vocab size (the reference's ``torch.topk`` would
    raise instead).

    ``topk`` may be a static int (one ``lax.top_k``) or a traced per-row
    int array broadcastable to ``[..., 1]`` (the per-request serving path:
    a full descending sort + per-row gather picks each row's own k-th
    value — same tie semantics).
    """
    V = logits.shape[-1]
    if isinstance(topk, (int, _np.integer)):
        topk = min(int(topk), V)
        kth = jax.lax.top_k(logits, topk)[0][..., -1:]
    else:
        k = jnp.clip(jnp.asarray(topk, jnp.int32).reshape(-1, 1), 1, V)
        svals = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)  # descending
        kth = jnp.take_along_axis(svals, k - 1, axis=-1)
    return jnp.where(logits < kth, NEG_INF, logits)


def sample_topk_logits(
    logits: jnp.ndarray, topk, temperature: float | jnp.ndarray
) -> jnp.ndarray:
    """Temperature-scale + top-k filter; returns filtered logits ready for a
    Gumbel-max draw.  ``temperature`` may be a scalar or a per-row array
    (any shape of size B — normalized to ``[B, 1]`` so it scales rows, not
    vocab lanes)."""
    t = jnp.asarray(temperature, jnp.float32)
    if t.ndim >= 1:
        t = t.reshape(-1, 1)  # per-row
    logits = logits.astype(jnp.float32) / jnp.maximum(t, 1e-6)
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
    topk,
    temperature: float | jnp.ndarray,
    greedy: bool = False,
    greedy_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-stream draws: row ``b`` consumes ONLY ``keys[b]`` and is bitwise
    identical to a standalone ``sample_topk(keys[b], logits[b:b+1], ...)``
    call.  This is what makes continuously-batched serving reproduce each
    request's solo token stream (the joint-key form cannot: its noise for
    row ``b`` depends on the batch size and position).

    Per-request serving extras: ``topk`` / ``temperature`` may be ``[B]``
    arrays (each row filtered/scaled by its own parameters), and
    ``greedy_rows`` (``[B]`` bool) makes the marked rows deterministic —
    implemented exactly as top-1 with zeroed Gumbel noise, which equals
    ``jnp.argmax`` of the raw logits (first-occurrence tie break)."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    B = logits.shape[0]
    static_k = isinstance(topk, (int, _np.integer))
    per_row_t = hasattr(temperature, "ndim") and getattr(
        temperature, "ndim", 0
    ) > 0
    if static_k and greedy_rows is None and not per_row_t:
        # Uniform parameters: the original static-top_k formulation
        # (bitwise- and speed-identical to previous releases).
        def one(k, row):
            return sample_topk(k, row[None, :], topk, temperature, False)[0]

        return jax.vmap(one)(keys, logits)

    # Per-request path: every parameter becomes a [B] vector and each row
    # is still bitwise its solo sample_topk run with those parameters
    # (value-based k-th filter == top_k's, noise from ONLY keys[b]).
    kks = (
        jnp.full((B,), min(int(topk), logits.shape[-1]), jnp.int32)
        if static_k
        else jnp.broadcast_to(
            jnp.asarray(topk, jnp.int32).reshape(-1), (B,)
        )
    )
    tts = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (B,)
    )
    if greedy_rows is not None:
        g = jnp.asarray(greedy_rows).reshape(B)
        kks = jnp.where(g, 1, kks)
        ggs = 1.0 - g.astype(jnp.float32)
    else:
        ggs = jnp.ones((B,), jnp.float32)

    def one_pr(k, row, kk, tt, gg):
        filtered = sample_topk_logits(row[None, :], kk, tt)
        noise = jax.random.gumbel(k, filtered.shape, jnp.float32) * gg
        return jnp.argmax(filtered + noise, axis=-1).astype(jnp.int32)[0]

    return jax.vmap(one_pr)(keys, logits, kks, tts, ggs)

"""Deterministic-pattern overfit: sharpen a random-init model's logits
on-chip so greedy-parity claims are testable without the published weights.

Why this exists.  Random-init logits sit in a tight band (every greedy
argmax is a near-tie), so NO fidelity number measured on them separates a
real kernel bug from benign last-ulp noise — the round-4 verdict's core
complaint about the quantized tiers' "agreement floors".  The published
checkpoints are unreachable (zero-egress sandbox; the probe is re-run every
round — see ROADMAP).  The sanctioned proxy: train the model on-chip until
its logits sharpen, then measure teacher-forced greedy agreement on THOSE
weights.  This module supplies the two pieces every caller shares
(``scripts/train_agreement_hw.py``, ``bench.py``):

- :func:`pattern_batch` — a fully DETERMINISTIC, fully LEARNABLE synthetic
  conversation: codebook-0 follows a fixed affine chain
  ``c0[t+1] = (a*c0[t] + b) mod M`` and codebooks 1..31 are affine in
  ``(c0, i)``, so a model that memorizes the transition drives both CE
  losses toward zero and its greedy gaps toward O(1) — unlike
  ``synthetic_conversation_batch``'s i.i.d. tokens, which are unlearnable
  past the marginals and leave the near-ties in place.
- :func:`overfit` — a plain AdamW overfit loop over that one batch (the
  repo's jitted train step), returning sharpened params.

The trained weights are a fidelity INSTRUMENT, not a speech model; the
numbers they gate are the relative agreement of two numeric paths on the
same sharpened decision boundaries.
"""

from __future__ import annotations

import sys
import time
from typing import Tuple

import numpy as np

from csm_tpu.config import CSMConfig


def pattern_batch(
    config: CSMConfig,
    seq_len: int,
    batch: int = 1,
    n_text: int = 8,
    accum: int = 1,
    phase: int = 0,
) -> dict:
    """Deterministic learnable training batch ``[accum, batch, S, 33]``.

    Audio codebook-0 follows ``c0[t+1] = (5*c0[t] + 7) mod (Va-1) + 1``
    (tokens stay in ``1..Va-1`` — 0 is the all-zero stop frame); codebook
    ``i`` is ``(c0[t] + 11*i) mod (Va-1) + 1``.  ``phase`` offsets the
    chain's start so train/eval contexts differ while the transition rule
    (what the model learns) is identical.  Labels cover EVERY audio frame
    (amortization 1 — sharpening all 32 heads is the point).
    """
    S, W = seq_len, config.frame_width
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    M = Va - 1
    ids = np.zeros((accum, batch, S, W), np.int32)
    mask = np.zeros((accum, batch, S, W), np.float32)
    labels = np.full((accum, batch, S, W), -100, np.int32)
    # Fixed text prefix (deterministic; batch rows get distinct prefixes so
    # B>1 still contributes independent gradients).
    for b in range(batch):
        ids[:, b, :n_text, W - 1] = (
            7 * np.arange(n_text) + 3 * b + phase
        ) % (config.text_vocab_size - 1) + 1
    mask[..., :n_text, W - 1] = 1.0
    n_audio = S - n_text
    c0 = np.zeros((batch, n_audio), np.int64)
    for b in range(batch):
        c = (1 + 13 * b + phase) % M
        for t in range(n_audio):
            c0[b, t] = c
            c = (5 * c + 7) % M
    i_idx = np.arange(N)[None, None, :]
    frames = (c0[:, :, None] + 11 * i_idx) % M + 1  # [batch, n_audio, N]
    frames[:, :, 0] = c0 + 1
    ids[:, :, n_text:, :N] = frames[None]
    mask[..., n_text:, :N] = 1.0
    labels[:, :, n_text:, :N] = frames[None]
    return {"input_ids": ids, "attention_mask": mask, "labels": labels}


def overfit(
    params: dict,
    config: CSMConfig,
    steps: int = 300,
    lr: float = 3e-4,
    seq_len: int = 64,
    batch: int = 4,
    log_every: int = 50,
    verbose: bool = True,
) -> Tuple[dict, float]:
    """AdamW-overfit ``params`` on one :func:`pattern_batch` for ``steps``
    optimizer steps; returns ``(trained_params, final_loss)``.  The Adam
    state is dropped before returning (callers immediately build the
    multi-GB inference bundles; a live f32 opt state would exhaust HBM).
    """
    import jax
    import jax.numpy as jnp

    from csm_tpu.train.loop import TrainState, make_optimizer, make_train_step

    steps = max(int(steps), 1)  # the final-metrics read requires >= 1 step
    opt = make_optimizer(lr, total_steps=steps, warmup_steps=min(20, steps // 5))
    step_fn = jax.jit(
        make_train_step(config, opt, batch * seq_len, remat=False),
        donate_argnums=(0,),
    )
    b_np = pattern_batch(config, seq_len, batch=batch)
    batch_j = {k: jnp.asarray(v) for k, v in b_np.items()}
    state = TrainState(
        params=params, opt_state=jax.jit(opt.init)(params), step=jnp.int32(0)
    )
    t0 = time.time()
    loss = float("nan")
    for s in range(steps):
        state, m = step_fn(state, None, batch_j)
        if verbose and (s % log_every == 0 or s == steps - 1):
            loss = float(m["loss"])  # host sync
            print(
                f"  overfit step {s}: loss {loss:.4f} "
                f"(bb {float(m['backbone_loss']):.4f} / "
                f"dec {float(m['decoder_loss']):.4f}) "
                f"[{time.time()-t0:.0f}s]",
                file=sys.stderr,
            )
    loss = float(m["loss"])
    trained = state.params
    del state  # free the f32 Adam moments before bundle building
    return trained, loss

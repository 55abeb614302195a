"""Rotary position embeddings with Llama-3 long-context scaling.

The reference model inherits RoPE from HF ``LlamaModel`` with
``rope_theta=500000`` and llama3 scaling ``{factor 32, low_freq_factor 1,
high_freq_factor 4, original_max_position_embeddings 8192}``
(``modeling_csm.py:79-85,100-106``).  This module reproduces that math
exactly (HF ``modeling_rope_utils._compute_llama3_parameters`` semantics) so
logits are parity-comparable against the torch reference.

TPU-first design: the cos/sin tables are precomputed once per model as a
``[max_positions, head_dim]`` pair of arrays (fp32), stored next to the
parameters, and gathered by position id inside jitted code — no trig inside
the decode loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from csm_tpu.config import LlamaConfig, RopeScalingConfig


def _llama3_scale_inv_freq(inv_freq: np.ndarray, scaling: RopeScalingConfig) -> np.ndarray:
    """Apply llama3 frequency rescaling to the inverse-frequency vector."""
    factor = scaling.factor
    low_freq_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
    high_freq_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor

    wavelen = 2.0 * np.pi / inv_freq
    # Smooth interpolation factor in the medium-frequency band.
    smooth = (scaling.original_max_position_embeddings / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq

    out = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    is_medium = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    out = np.where(is_medium, smoothed, out)
    return out


def compute_inv_freq(config: LlamaConfig) -> np.ndarray:
    """Inverse frequencies ``[head_dim // 2]`` (fp32), with optional llama3
    scaling applied."""
    head_dim = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if config.rope_scaling is not None and config.rope_scaling.rope_type == "llama3":
        inv_freq = _llama3_scale_inv_freq(inv_freq, config.rope_scaling)
    return inv_freq.astype(np.float32)


def compute_rope_table(
    config: LlamaConfig, max_positions: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute ``(cos, sin)`` tables of shape ``[max_positions, head_dim]``.

    Matches the HF layout: frequencies are concatenated twice along the last
    axis (``emb = cat(freqs, freqs)``), paired with the ``rotate_half``
    formulation in :func:`apply_rope`.
    """
    if max_positions is None:
        max_positions = config.max_position_embeddings
    inv_freq = compute_inv_freq(config)  # [hd/2]
    t = np.arange(max_positions, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [T, hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [T, hd]
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate ``x`` ``[..., T, num_heads, head_dim]`` by position tables
    ``cos/sin`` ``[..., T, head_dim]`` (HF ``rotate_half`` convention).

    The tables are broadcast over the heads axis; computation runs in fp32
    and is cast back to the input dtype.
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    cos = cos[..., :, None, :]  # [..., T, 1, hd]
    sin = sin[..., :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos + rotated * sin).astype(dtype)

"""Mimi codec: model definition and functional forward passes.

Architecture (kyutai/mimi, cross-checked against the public HF port used as
the parity oracle in tests):

encode:  wave ``[B, 1, T]``
  → SEANet encoder (causal convs, ELU, residual blocks; total stride 960)
  → causal transformer @ 25 Hz (LayerNorm+bias, MHA with RoPE θ=10000,
    sliding window 250, GELU MLP, per-channel layer scale)
  → causal stride-2 "replicate"-padded downsample → 12.5 Hz
  → split RVQ: 1 semantic + 31 acoustic residual quantizers, each side with
    its own 1×1 input/output projections; nearest-neighbor (Euclidean)
    code assignment → codes ``[B, 32, frames]``

decode:  codes → RVQ dequantize (sum of codebook vectors + output proj,
  semantic + acoustic summed) → grouped transposed-conv upsample (stride 2)
  → causal transformer → SEANet decoder (transposed convs with causal right
  trim) → wave ``[B, 1, T]``

TPU-first notes: all convs are ``lax.conv_general_dilated`` in the torch
``NCH``/``OIH`` layout with **static** causal padding computed at trace
time; the transformer is the stacked-params + ``lax.scan`` pattern; RVQ
nearest-neighbor is one batched matmul per quantizer (argmin of
``|x|²−2x·e+|e|²`` with the ``|x|²`` term dropped).  Everything jits.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class MimiCodecConfig:
    """Shape of the Mimi codec; defaults are the published kyutai/mimi."""

    sampling_rate: int = 24000
    frame_rate: float = 12.5
    encodec_frame_rate: float = 25.0
    audio_channels: int = 1
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    codebook_size: int = 2048
    codebook_dim: int = 256
    hidden_size: int = 512
    num_filters: int = 64
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    trim_right_ratio: float = 1.0
    vector_quantization_hidden_dimension: int = 256
    upsample_groups: int = 512
    # transformer
    num_hidden_layers: int = 8
    intermediate_size: int = 2048
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: Optional[int] = 250
    layer_scale_initial_scale: float = 0.01

    @property
    def total_stride(self) -> int:
        """Encoder hop length at the transformer rate (960 samples @ 25 Hz
        for the default config; ×2 downsample → 1920 per 12.5 Hz frame)."""
        s = 1
        for r in self.upsampling_ratios:
            s *= r
        return s

    @property
    def frame_size(self) -> int:
        return int(self.sampling_rate / self.frame_rate)

    @classmethod
    def tiny(cls, **overrides) -> "MimiCodecConfig":
        kwargs = dict(
            num_quantizers=8,
            codebook_size=64,
            codebook_dim=16,
            hidden_size=32,
            num_filters=8,
            vector_quantization_hidden_dimension=16,
            upsample_groups=32,
            num_hidden_layers=2,
            intermediate_size=64,
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=8,
            sliding_window=16,
        )
        kwargs.update(overrides)
        return cls(**kwargs)


# ---------------------------------------------------------------------------
# Layer plan: the static structure of the SEANet conv stacks
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "constant"
    transposed: bool = False

    @property
    def effective_kernel(self) -> int:
        return (self.kernel - 1) * self.dilation + 1

    @property
    def padding_total(self) -> int:
        return self.effective_kernel - self.stride


def encoder_plan(cfg: MimiCodecConfig) -> List:
    """The encoder layer sequence: ('conv', ConvSpec) / ('elu',) /
    ('resnet', [ConvSpec, ConvSpec]).  Mirrors SEANet with reversed ratios."""
    plan = [("conv", ConvSpec(cfg.audio_channels, cfg.num_filters, cfg.kernel_size))]
    scaling = 1
    for ratio in reversed(cfg.upsampling_ratios):
        current = scaling * cfg.num_filters
        for j in range(cfg.num_residual_layers):
            hidden = current // cfg.compress
            plan.append(
                (
                    "resnet",
                    [
                        ConvSpec(current, hidden, cfg.residual_kernel_size,
                                 dilation=cfg.dilation_growth_rate ** j),
                        ConvSpec(hidden, current, 1),
                    ],
                )
            )
        plan.append(("elu",))
        plan.append(("conv", ConvSpec(current, current * 2, ratio * 2, stride=ratio)))
        scaling *= 2
    plan.append(("elu",))
    plan.append(
        ("conv", ConvSpec(scaling * cfg.num_filters, cfg.hidden_size, cfg.last_kernel_size))
    )
    return plan


def decoder_plan(cfg: MimiCodecConfig) -> List:
    """The decoder layer sequence (SEANet mirror with transposed convs)."""
    scaling = 2 ** len(cfg.upsampling_ratios)
    plan = [("conv", ConvSpec(cfg.hidden_size, scaling * cfg.num_filters, cfg.kernel_size))]
    for ratio in cfg.upsampling_ratios:
        current = scaling * cfg.num_filters
        plan.append(("elu",))
        plan.append(
            ("conv", ConvSpec(current, current // 2, ratio * 2, stride=ratio, transposed=True))
        )
        for j in range(cfg.num_residual_layers):
            dim = current // 2
            hidden = dim // cfg.compress
            plan.append(
                (
                    "resnet",
                    [
                        ConvSpec(dim, hidden, cfg.residual_kernel_size,
                                 dilation=cfg.dilation_growth_rate ** j),
                        ConvSpec(hidden, dim, 1),
                    ],
                )
            )
        scaling //= 2
    plan.append(("elu",))
    plan.append(("conv", ConvSpec(cfg.num_filters, cfg.audio_channels, cfg.last_kernel_size)))
    return plan


def downsample_spec(cfg: MimiCodecConfig) -> ConvSpec:
    k = 2 * int(cfg.encodec_frame_rate / cfg.frame_rate)
    return ConvSpec(cfg.hidden_size, cfg.hidden_size, k, stride=2, bias=False,
                    pad_mode="replicate")


def upsample_spec(cfg: MimiCodecConfig) -> ConvSpec:
    k = 2 * int(cfg.encodec_frame_rate / cfg.frame_rate)
    return ConvSpec(cfg.hidden_size, cfg.hidden_size, k, stride=2, bias=False,
                    groups=cfg.upsample_groups, transposed=True)


# ---------------------------------------------------------------------------
# Conv primitives (static causal padding, torch NCH/OIH layout)
# ---------------------------------------------------------------------------

_DN = ("NCH", "OIH", "NCH")


def causal_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
                  spec: ConvSpec) -> jnp.ndarray:
    """Causal conv: left-pad ``padding_total``, right-pad the ``extra``
    needed so no sample is dropped (ceil framing), then a valid conv."""
    length = x.shape[-1]
    k_eff, stride = spec.effective_kernel, spec.stride
    n_frames = math.ceil((length - k_eff + spec.padding_total) / stride) + 1 - 1
    ideal = n_frames * stride + k_eff - spec.padding_total
    extra = ideal - length

    pad = [(0, 0), (0, 0), (spec.padding_total, extra)]
    if spec.pad_mode == "replicate":
        x = jnp.pad(x, pad, mode="edge")
    else:
        x = jnp.pad(x, pad)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(spec.dilation,), dimension_numbers=_DN,
        feature_group_count=spec.groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def causal_conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
                            spec: ConvSpec, trim_right_ratio: float = 1.0) -> jnp.ndarray:
    """Transposed conv with causal trim.

    ``w`` is in torch ConvTranspose layout ``[in, out/groups, k]``; the conv
    equivalent uses the spatially-flipped, transposed kernel with input
    dilation = stride.  The causal variant trims ``ceil((k - stride) ·
    trim_right_ratio)`` from the right, remainder from the left.
    """
    k, stride = spec.kernel, spec.stride
    # [in, out/groups, k] -> groups stacked: conv kernel [out, in/groups, k]
    if spec.groups == 1:
        kernel = jnp.flip(jnp.swapaxes(w, 0, 1), -1)
    else:
        in_per, g = w.shape[0] // spec.groups, spec.groups
        wg = w.reshape(g, in_per, w.shape[1], k)  # [g, in/g, out/g, k]
        kernel = jnp.flip(jnp.swapaxes(wg, 1, 2), -1).reshape(
            g * w.shape[1], in_per, k
        )
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        feature_group_count=spec.groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    padding_total = k - stride
    padding_right = math.ceil(padding_total * trim_right_ratio)
    padding_left = padding_total - padding_right
    end = out.shape[-1] - padding_right
    return out[..., padding_left:end]


def _apply_plan(plan: List, params: List[dict], x: jnp.ndarray,
                trim_right_ratio: float = 1.0) -> jnp.ndarray:
    """Run a SEANet layer plan; ``params[i]`` matches ``plan[i]``."""
    for (item, p) in zip(plan, params):
        kind = item[0]
        if kind == "elu":
            x = jax.nn.elu(x)
        elif kind == "conv":
            spec = item[1]
            if spec.transposed:
                x = causal_conv_transpose1d(x, p["w"], p.get("b"), spec, trim_right_ratio)
            else:
                x = causal_conv1d(x, p["w"], p.get("b"), spec)
        elif kind == "resnet":
            specs = item[1]
            res = x
            for spec, cp in zip(specs, p["block"]):
                x = jax.nn.elu(x)
                x = causal_conv1d(x, cp["w"], cp.get("b"), spec)
            x = res + x
        else:  # pragma: no cover
            raise ValueError(kind)
    return x


# ---------------------------------------------------------------------------
# Codec transformer (LayerNorm + MHA/RoPE + layer scale + GELU MLP)
# ---------------------------------------------------------------------------


def _codec_rope(cfg: MimiCodecConfig, max_positions: int):
    inv_freq = 1.0 / (
        cfg.rope_theta
        ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
    )
    t = np.arange(max_positions, dtype=np.float32)
    freqs = np.outer(t, inv_freq.astype(np.float32))
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _layernorm(x, w, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def codec_transformer(cfg: MimiCodecConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Causal (sliding-window) transformer over ``[B, T, H]``."""
    B, T, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    cos_t, sin_t = _codec_rope(cfg, T)
    cos = cos_t[None]  # [1, T, hd]
    sin = sin_t[None]

    # Causal + sliding-window mask.  The original moshi codec attends with a
    # 250-step context window; note the HF 4.57 eager port drops the window
    # (full causal) — we follow moshi, which only differs for inputs longer
    # than the window (>10 s at 25 Hz).
    q_pos = jnp.arange(T)[:, None]
    k_pos = jnp.arange(T)[None, :]
    ok = k_pos <= q_pos
    if cfg.sliding_window is not None:
        ok = ok & (q_pos - k_pos < cfg.sliding_window)
    bias = jnp.where(ok, 0.0, NEG_INF)[None, None]  # [1, 1, T, T]

    def rope(v):  # [B, T, nh, hd]
        half = hd // 2
        v1, v2 = v[..., :half], v[..., half:]
        rot = jnp.concatenate([-v2, v1], axis=-1)
        return v * cos[:, :, None, :] + rot * sin[:, :, None, :]

    def layer(h, lp):
        y = _layernorm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        q = (y @ lp["wq"]).reshape(B, T, nh, hd)
        k = (y @ lp["wk"]).reshape(B, T, nh, hd)
        v = (y @ lp["wv"]).reshape(B, T, nh, hd)
        q, k = rope(q), rope(k)
        scores = jnp.einsum("bsnh,btnh->bnst", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnst,btnh->bsnh", probs, v).reshape(B, T, nh * hd)
        h = h + (attn @ lp["wo"]) * lp["scale_attn"]
        y = _layernorm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        y = jax.nn.gelu(y @ lp["fc1"], approximate=False) @ lp["fc2"]
        return h + y * lp["scale_mlp"], None

    h, _ = jax.lax.scan(layer, x, params["layers"])
    return h


# ---------------------------------------------------------------------------
# Residual vector quantization
# ---------------------------------------------------------------------------


def _rvq_encode(codebooks: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sequential residual nearest-neighbor quantization.

    ``codebooks``: ``[Q, V, D]`` centroids; ``x``: ``[B, T, D]``.  Returns
    ``[B, Q, T]`` indices.  Distance argmin drops the ``|x|²`` term.
    """

    def step(residual, embed):  # embed [V, D]
        scores = residual @ embed.T  # [B, T, V]
        dist = jnp.sum(embed * embed, axis=-1)[None, None] - 2.0 * scores
        idx = jnp.argmin(dist, axis=-1)  # [B, T]
        quantized = jnp.take(embed, idx, axis=0)
        return residual - quantized, idx

    _, indices = jax.lax.scan(step, x, codebooks)  # [Q, B, T]
    return indices.transpose(1, 0, 2)


def _rvq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """``codes [B, Q, T]`` → summed centroid vectors ``[B, T, D]``."""
    B, Q, T = codes.shape
    onehot_free = jax.vmap(
        lambda embed, idx: jnp.take(embed, idx, axis=0), in_axes=(0, 1), out_axes=1
    )  # per-quantizer gather
    vecs = onehot_free(codebooks, codes)  # [B, Q, T, D]
    return vecs.sum(axis=1)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def mimi_encode(cfg: MimiCodecConfig, params: dict, wave: jnp.ndarray,
                num_quantizers: Optional[int] = None) -> jnp.ndarray:
    """``wave [B, 1, T]`` → codes ``[B, num_quantizers, frames]``."""
    nq = cfg.num_quantizers if num_quantizers is None else num_quantizers
    x = _apply_plan(encoder_plan(cfg), params["encoder"], wave.astype(jnp.float32))
    x = codec_transformer(cfg, params["encoder_transformer"], x.swapaxes(1, 2))
    x = x.swapaxes(1, 2)
    x = causal_conv1d(x, params["downsample"]["w"], None, downsample_spec(cfg))

    emb = x.swapaxes(1, 2)  # [B, T', H]
    q = params["quantizer"]
    sem_in = emb @ q["semantic"]["input_proj"]
    sem_codes = _rvq_encode(q["semantic"]["codebooks"], sem_in)
    n_ac = nq - cfg.num_semantic_quantizers
    if n_ac > 0:
        ac_in = emb @ q["acoustic"]["input_proj"]
        ac_codes = _rvq_encode(q["acoustic"]["codebooks"][:n_ac], ac_in)
        return jnp.concatenate([sem_codes, ac_codes], axis=1)
    return sem_codes


def mimi_decode(cfg: MimiCodecConfig, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes ``[B, Q, frames]`` → wave ``[B, 1, T]``."""
    q = params["quantizer"]
    ns = cfg.num_semantic_quantizers
    sem = _rvq_decode(q["semantic"]["codebooks"], codes[:, :ns])
    emb = sem @ q["semantic"]["output_proj"]
    if codes.shape[1] > ns:
        n_ac = codes.shape[1] - ns
        ac = _rvq_decode(q["acoustic"]["codebooks"][:n_ac], codes[:, ns:])
        emb = emb + ac @ q["acoustic"]["output_proj"]

    x = emb.swapaxes(1, 2)  # [B, H, T']
    x = causal_conv_transpose1d(x, params["upsample"]["w"], None, upsample_spec(cfg),
                                cfg.trim_right_ratio)
    x = codec_transformer(cfg, params["decoder_transformer"], x.swapaxes(1, 2))
    x = x.swapaxes(1, 2)
    return _apply_plan(decoder_plan(cfg), params["decoder"], x, cfg.trim_right_ratio)


# ---------------------------------------------------------------------------
# User-facing wrapper
# ---------------------------------------------------------------------------


class MimiCodec:
    """Host-callable Mimi codec with per-shape jit caching.

    Implements the interface the processor expects
    (``csm_tpu.data.processor``): ``encode(wave [T]) -> [num_codebooks, F]``
    plus batched ``encode_batch``/``decode`` and a ``sample_rate`` attribute.
    """

    def __init__(self, config: MimiCodecConfig, params: dict,
                 num_codebooks: Optional[int] = None):
        self.config = config
        self.params = params
        self.num_codebooks = num_codebooks or config.num_quantizers
        self.sample_rate = config.sampling_rate
        self.frame_rate = config.frame_rate
        self._encode_jit = jax.jit(
            lambda p, w: mimi_encode(config, p, w, self.num_codebooks)
        )
        self._decode_jit = jax.jit(lambda p, c: mimi_decode(config, p, c))

    def set_num_codebooks(self, n: int) -> None:
        """Reference-API shim (``train.py:366``)."""
        self.num_codebooks = n
        self._encode_jit = jax.jit(
            lambda p, w: mimi_encode(self.config, p, w, n)
        )

    def encode(self, wave) -> np.ndarray:
        """``[T]`` float wave → ``[num_codebooks, frames]`` int codes."""
        wave = np.asarray(wave, np.float32)
        if wave.ndim != 1:
            raise ValueError(f"expected mono [T] wave, got {wave.shape}")
        codes = self._encode_jit(self.params, jnp.asarray(wave)[None, None, :])
        return np.asarray(codes[0])

    def encode_batch(self, waves: jnp.ndarray) -> jnp.ndarray:
        """``[B, 1, T]`` → ``[B, num_codebooks, frames]`` (on device)."""
        return self._encode_jit(self.params, waves)

    def decode(self, codes) -> np.ndarray:
        """``[Q, frames]`` or ``[B, Q, frames]`` codes → float wave."""
        codes = jnp.asarray(codes)
        if codes.ndim == 2:
            return np.asarray(self._decode_jit(self.params, codes[None])[0, 0])
        return np.asarray(self._decode_jit(self.params, codes)[:, 0])


def load_mimi(path: Optional[str] = None, num_codebooks: int = 32,
              config: Optional[MimiCodecConfig] = None) -> MimiCodec:
    """Load Mimi weights (safetensors file with the HF ``MimiModel`` key
    layout) and return a ready codec.  ``path`` may also be a directory
    containing ``model.safetensors``."""
    import os

    from csm_tpu.codec.convert import mimi_params_from_state_dict

    cfg = config or MimiCodecConfig()
    if path is None:
        path = os.environ.get("CSM_TPU_MIMI_PATH")
    if path is None:
        # Default to the published checkpoint (requires network access).
        try:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download("kyutai/mimi", "model.safetensors")
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(
                "Mimi weights not found: pass `path`, set CSM_TPU_MIMI_PATH to "
                "a safetensors file with the HF MimiModel layout, or enable "
                f"network access to fetch kyutai/mimi ({e})."
            ) from e
    if os.path.isdir(path):
        path = os.path.join(path, "model.safetensors")
    from safetensors.numpy import load_file

    params = mimi_params_from_state_dict(load_file(path), cfg)
    return MimiCodec(cfg, params, num_codebooks=num_codebooks)

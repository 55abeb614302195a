"""Streaming Mimi decode: incremental codes → audio with carried state.

The reference pipeline decodes a whole utterance at the end
(``README.md:114-118``); for live serving the codec must emit audio as
frames arrive.  This module implements exact chunked decoding — concatenated
chunk outputs are bit-equal (up to fp reassociation) to a full
:func:`csm_tpu.codec.mimi.mimi_decode` over the same codes — by carrying:

- a **padding cache** per causal conv: the last ``padding_total`` input
  samples, replacing the zero left-pad from the second chunk on (the JAX
  equivalent of HF's ``MimiConv1dPaddingCache``);
- an **overlap tail** per transposed conv: a stride-``s`` kernel-``k``
  transposed conv overlaps adjacent chunks by ``k − s`` output samples,
  which are summed into the next chunk's head;
- a **sliding-window KV cache** for the decoder transformer: the last
  ``sliding_window`` keys/values in a shift buffer with absolute RoPE
  positions — matching moshi's 250-step context exactly.

Everything is a static-shape pytree: ``decode_step`` jits per chunk size,
and the state threads through ``lax.scan`` for batched offline use.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.codec.mimi import (
    NEG_INF,
    ConvSpec,
    MimiCodecConfig,
    _codec_rope,
    _layernorm,
    _rvq_decode,
    decoder_plan,
    upsample_spec,
)

_DN = ("NCH", "OIH", "NCH")


# ---------------------------------------------------------------------------
# Streaming conv primitives
# ---------------------------------------------------------------------------


def _stream_conv(x, w, b, spec: ConvSpec, cache):
    """Causal conv with a carried left-context cache (stride-1 convs only —
    every conv in the decoder stack is stride 1)."""
    assert spec.stride == 1, "streaming conv supports stride-1 layers"
    pad = spec.padding_total
    xc = jnp.concatenate([cache, x], axis=-1)
    out = jax.lax.conv_general_dilated(
        xc, w, window_strides=(1,), padding="VALID",
        rhs_dilation=(spec.dilation,), dimension_numbers=_DN,
        feature_group_count=spec.groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    new_cache = xc[..., xc.shape[-1] - pad :] if pad > 0 else cache
    return out, new_cache


def _stream_conv_transpose(x, w, b, spec: ConvSpec, tail):
    """Causal transposed conv emitting ``t·stride`` samples per ``t``-sample
    chunk; the ``k − s`` raw samples beyond that are carried and summed into
    the next chunk's head."""
    k, s = spec.kernel, spec.stride
    if spec.groups == 1:
        kernel = jnp.flip(jnp.swapaxes(w, 0, 1), -1)
    else:
        in_per = w.shape[0] // spec.groups
        wg = w.reshape(spec.groups, in_per, w.shape[1], k)
        kernel = jnp.flip(jnp.swapaxes(wg, 1, 2), -1).reshape(
            spec.groups * w.shape[1], in_per, k
        )
    raw = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(s,), dimension_numbers=_DN,
        feature_group_count=spec.groups,
    )  # [B, C, (t-1)*s + k]
    t_out = x.shape[-1] * s
    overlap = k - s
    head = raw[..., :t_out]
    if overlap > 0:
        head = head.at[..., :overlap].add(tail)
        new_tail = raw[..., t_out : t_out + overlap]
    else:
        new_tail = tail
    # Bias goes on after the overlap-add: the carried tail is bias-free, so
    # each output sample receives the bias exactly once.
    if b is not None:
        head = head + b[None, :, None]
    return head, new_tail


# ---------------------------------------------------------------------------
# Streaming transformer (shift KV cache, absolute positions)
# ---------------------------------------------------------------------------


_ROPE_TABLE_POS = 8192  # streaming RoPE table length; rebased before hit


def _rebase_rotation(cfg: MimiCodecConfig, delta: int):
    """Constant ``(cos, sin)`` of ``-delta * inv_freq`` (float64 at trace
    time, HF duplicated layout) — rotating a cached key by this shifts its
    RoPE phase back by exactly ``delta`` positions."""
    inv_freq = 1.0 / (
        np.float64(cfg.rope_theta)
        ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
    )
    ang = -np.float64(delta) * inv_freq
    emb = np.concatenate([ang, ang], axis=-1)
    return (
        jnp.asarray(np.cos(emb), jnp.float32),
        jnp.asarray(np.sin(emb), jnp.float32),
    )


def _stream_transformer(cfg: MimiCodecConfig, params: dict, x, kv):
    """One cached transformer step over a ``[B, t, H]`` chunk.

    ``kv``: dict with ``k``/``v`` ``[L, B, W, nh, hd]`` shift buffers,
    ``valid`` ``[W]`` and ``pos`` scalar (absolute position of the chunk
    start).  Window ``W = cfg.sliding_window`` (or ``max_positions``).

    Unbounded streams: the RoPE table covers ``_ROPE_TABLE_POS`` positions;
    before the position would clamp, the state is **rebased** — cached keys
    are rotated by a constant ``-delta`` phase (RoPE attention depends only
    on relative position, and every live key sits within the ≤W window) and
    ``pos`` shifts down.  Exact for streams of any length, always jittable.
    """
    B, t, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    W = kv["k"].shape[2]
    if cfg.sliding_window is not None and t > W - cfg.sliding_window + 1:
        raise ValueError(
            f"chunk of {t} tokens exceeds the KV buffer margin "
            f"({W} slots, window {cfg.sliding_window}); "
            "increase max_chunk_frames in decode_state_init"
        )

    max_pos = _ROPE_TABLE_POS
    delta = max_pos // 2
    cos_d, sin_d = _rebase_rotation(cfg, delta)

    def rebase(kv):
        k = kv["k"]
        half = hd // 2
        k1, k2 = k[..., :half], k[..., half:]
        rot = jnp.concatenate([-k2, k1], axis=-1)
        k_new = (k * cos_d + rot * sin_d).astype(k.dtype)
        return {**kv, "k": k_new, "pos": kv["pos"] - delta}

    kv = jax.lax.cond(kv["pos"] + t >= max_pos, rebase, lambda s: s, kv)
    pos0 = kv["pos"]

    cos_t, sin_t = _codec_rope(cfg, max_pos)
    q_abs = pos0 + jnp.arange(t)
    cos_q = jnp.take(cos_t, q_abs, axis=0)[None]  # [1, t, hd]
    sin_q = jnp.take(sin_t, q_abs, axis=0)[None]

    def rope(v, cos, sin):
        half = hd // 2
        v1, v2 = v[..., :half], v[..., half:]
        rot = jnp.concatenate([-v2, v1], axis=-1)
        return v * cos[:, :, None, :] + rot * sin[:, :, None, :]

    # Key slots: after shifting in the new chunk, slot j holds absolute
    # position pos0 + t - W + j.
    k_abs = pos0 + t - W + jnp.arange(W)
    valid = k_abs >= 0
    q_pos = q_abs[:, None]
    k_pos = k_abs[None, :]
    ok = (k_pos <= q_pos) & valid[None, :]
    if cfg.sliding_window is not None:
        ok = ok & (q_pos - k_pos < cfg.sliding_window)
    bias = jnp.where(ok, 0.0, NEG_INF)[None, None]  # [1, 1, t, W]

    def layer(carry, inp):
        h = carry
        lp, ck, cv = inp
        y = _layernorm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        q = (y @ lp["wq"]).reshape(B, t, nh, hd)
        k = (y @ lp["wk"]).reshape(B, t, nh, hd)
        v = (y @ lp["wv"]).reshape(B, t, nh, hd)
        q = rope(q, cos_q, sin_q)
        k = rope(k, cos_q, sin_q)
        ck = jnp.concatenate([ck[:, t:], k], axis=1)  # shift in new keys
        cv = jnp.concatenate([cv[:, t:], v], axis=1)
        scores = jnp.einsum("bsnh,btnh->bnst", q, ck,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnst,btnh->bsnh", probs, cv).reshape(B, t, nh * hd)
        h = h + (attn @ lp["wo"]) * lp["scale_attn"]
        y = _layernorm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        y = jax.nn.gelu(y @ lp["fc1"], approximate=False) @ lp["fc2"]
        return h + y * lp["scale_mlp"], (ck, cv)

    h, (new_k, new_v) = jax.lax.scan(layer, x, (params["layers"], kv["k"], kv["v"]))
    return h, {"k": new_k, "v": new_v, "pos": pos0 + t}


# ---------------------------------------------------------------------------
# Decoder streaming state
# ---------------------------------------------------------------------------


def decode_state_init(cfg: MimiCodecConfig, batch: int, dtype=jnp.float32,
                      max_chunk_frames: int = 8) -> dict:
    """Zero-initialized streaming-decode state (a pytree).

    ``max_chunk_frames``: largest codes chunk a single :func:`decode_step`
    will receive.  The KV shift buffer holds ``window + 2*max_chunk − 1``
    keys so the earliest query of a chunk still sees its full window (the
    transformer consumes 2 tokens per frame after the ×2 upsample).
    """
    W = (cfg.sliding_window or 256) + 2 * max_chunk_frames - 1
    L = cfg.num_hidden_layers
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    up = upsample_spec(cfg)
    convs: List[jnp.ndarray] = []
    tails: List[jnp.ndarray] = []
    for item in decoder_plan(cfg):
        if item[0] == "conv":
            spec = item[1]
            if spec.transposed:
                tails.append(jnp.zeros((batch, spec.out_ch, spec.kernel - spec.stride), dtype))
            else:
                convs.append(jnp.zeros((batch, spec.in_ch, spec.padding_total), dtype))
        elif item[0] == "resnet":
            for spec in item[1]:
                convs.append(jnp.zeros((batch, spec.in_ch, spec.padding_total), dtype))

    return {
        "upsample_tail": jnp.zeros((batch, up.in_ch, up.kernel - up.stride), dtype),
        "kv": {
            "k": jnp.zeros((L, batch, W, nh, hd), dtype),
            "v": jnp.zeros((L, batch, W, nh, hd), dtype),
            "pos": jnp.int32(0),
        },
        "conv_caches": convs,
        "conv_tails": tails,
    }


def decode_step(cfg: MimiCodecConfig, params: dict, state: dict,
                codes: jnp.ndarray) -> Tuple[jnp.ndarray, dict]:
    """Decode ``codes [B, Q, t]`` incrementally → ``(wave [B, 1, t·hop],
    new_state)`` where hop = total_stride × 2 (1920 samples / 80 ms per
    frame for the default config)."""
    q = params["quantizer"]
    ns = cfg.num_semantic_quantizers
    sem = _rvq_decode(q["semantic"]["codebooks"], codes[:, :ns])
    emb = sem @ q["semantic"]["output_proj"]
    if codes.shape[1] > ns:
        n_ac = codes.shape[1] - ns
        ac = _rvq_decode(q["acoustic"]["codebooks"][:n_ac], codes[:, ns:])
        emb = emb + ac @ q["acoustic"]["output_proj"]

    x = emb.swapaxes(1, 2)  # [B, H, t]
    x, up_tail = _stream_conv_transpose(
        x, params["upsample"]["w"], None, upsample_spec(cfg), state["upsample_tail"]
    )
    h, kv = _stream_transformer(cfg, params["decoder_transformer"], x.swapaxes(1, 2),
                                state["kv"])
    x = h.swapaxes(1, 2)

    convs = list(state["conv_caches"])
    tails = list(state["conv_tails"])
    ci = ti = 0
    for item, p in zip(decoder_plan(cfg), params["decoder"]):
        kind = item[0]
        if kind == "elu":
            x = jax.nn.elu(x)
        elif kind == "conv":
            spec = item[1]
            if spec.transposed:
                x, tails[ti] = _stream_conv_transpose(x, p["w"], p.get("b"), spec,
                                                      tails[ti])
                ti += 1
            else:
                x, convs[ci] = _stream_conv(x, p["w"], p.get("b"), spec, convs[ci])
                ci += 1
        else:  # resnet
            res = x
            for spec, cp in zip(item[1], p["block"]):
                x = jax.nn.elu(x)
                x, convs[ci] = _stream_conv(x, cp["w"], cp.get("b"), spec, convs[ci])
                ci += 1
            x = res + x

    new_state = {
        "upsample_tail": up_tail,
        "kv": kv,
        "conv_caches": convs,
        "conv_tails": tails,
    }
    return x, new_state


# ---------------------------------------------------------------------------
# Encoder streaming state
# ---------------------------------------------------------------------------


def _encoder_conv_specs(cfg: MimiCodecConfig):
    """Ordered ConvSpecs of every conv in the encoder stack + downsample
    (the layers that need padding caches), with their pad modes."""
    from csm_tpu.codec.mimi import downsample_spec, encoder_plan

    specs = []
    for item in encoder_plan(cfg):
        if item[0] == "conv":
            specs.append(item[1])
        elif item[0] == "resnet":
            specs.extend(item[1])
    specs.append(downsample_spec(cfg))
    return specs


def encode_state_init(cfg: MimiCodecConfig, batch: int, dtype=jnp.float32,
                      max_chunk_frames: int = 8) -> dict:
    """Zero/replicate-initialized streaming-encode state.

    Chunks must be multiples of the 80 ms frame size (``frame_size``
    samples) so every strided conv's phase stays aligned — the same
    constraint the original streaming codec imposes.
    """
    W = (cfg.sliding_window or 256) + 2 * max_chunk_frames - 1
    L = cfg.num_hidden_layers
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    return {
        "conv_caches": [
            jnp.zeros((batch, s.in_ch, s.padding_total), dtype)
            for s in _encoder_conv_specs(cfg)
        ],
        # "replicate"-padded layers (the downsample) seed their cache from
        # the first chunk's first sample instead of zeros.
        "started": jnp.zeros((), jnp.bool_),
        "kv": {
            "k": jnp.zeros((L, batch, W, nh, hd), dtype),
            "v": jnp.zeros((L, batch, W, nh, hd), dtype),
            "pos": jnp.int32(0),
        },
    }


def _stream_conv_strided(x, w, b, spec: ConvSpec, cache):
    """Causal conv with carried left context, any stride.  The chunk length
    must be a multiple of the stride (guaranteed by frame-aligned chunks)."""
    xc = jnp.concatenate([cache, x], axis=-1)
    out = jax.lax.conv_general_dilated(
        xc, w, window_strides=(spec.stride,), padding="VALID",
        rhs_dilation=(spec.dilation,), dimension_numbers=_DN,
        feature_group_count=spec.groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    pad = spec.padding_total
    new_cache = xc[..., xc.shape[-1] - pad :] if pad > 0 else cache
    return out, new_cache


def encode_step(cfg: MimiCodecConfig, params: dict, state: dict,
                wave: jnp.ndarray, num_quantizers: Optional[int] = None
                ) -> Tuple[jnp.ndarray, dict]:
    """Encode a ``[B, 1, t·frame_size]`` audio chunk incrementally →
    ``(codes [B, Q, t], new_state)``."""
    from csm_tpu.codec.mimi import _rvq_encode, encoder_plan

    if wave.shape[-1] % cfg.frame_size != 0:
        raise ValueError(
            f"streaming encode chunks must be multiples of frame_size="
            f"{cfg.frame_size}, got {wave.shape[-1]}"
        )
    nq = num_quantizers if num_quantizers is not None else cfg.num_quantizers
    specs = _encoder_conv_specs(cfg)
    convs = list(state["conv_caches"])
    started = state["started"]

    x = wave.astype(jnp.float32)
    ci = 0
    for item, p in zip(encoder_plan(cfg), params["encoder"]):
        kind = item[0]
        if kind == "elu":
            x = jax.nn.elu(x)
        elif kind == "conv":
            x, convs[ci] = _stream_conv_strided(x, p["w"], p.get("b"), item[1], convs[ci])
            ci += 1
        else:  # resnet
            res = x
            for spec, cp in zip(item[1], p["block"]):
                x = jax.nn.elu(x)
                x, convs[ci] = _stream_conv_strided(x, cp["w"], cp.get("b"), spec, convs[ci])
                ci += 1
            x = res + x

    h, kv = _stream_transformer(cfg, params["encoder_transformer"], x.swapaxes(1, 2),
                                state["kv"])
    x = h.swapaxes(1, 2)

    # Downsample: "replicate" pad mode — on the first chunk its cache holds
    # copies of the chunk's first hidden sample (HF MimiConv1dPaddingCache
    # semantics for replicate layers).
    ds_spec = specs[-1]
    ds_cache = convs[ci]
    seeded = jnp.where(
        started, ds_cache, jnp.broadcast_to(x[..., :1], ds_cache.shape)
    )
    x, new_ds_cache = _stream_conv_strided(x, params["downsample"]["w"], None,
                                           ds_spec, seeded)
    convs[ci] = new_ds_cache

    emb = x.swapaxes(1, 2)
    q = params["quantizer"]
    sem = _rvq_encode(q["semantic"]["codebooks"], emb @ q["semantic"]["input_proj"])
    if nq > cfg.num_semantic_quantizers:
        ac = _rvq_encode(
            q["acoustic"]["codebooks"][: nq - cfg.num_semantic_quantizers],
            emb @ q["acoustic"]["input_proj"],
        )
        codes = jnp.concatenate([sem, ac], axis=1)
    else:
        codes = sem

    new_state = {"conv_caches": convs, "started": jnp.bool_(True), "kv": kv}
    return codes, new_state


class StreamingMimiEncoder:
    """Stateful wrapper: feed frame-aligned audio, get codes per frame.

    >>> enc = StreamingMimiEncoder(codec)
    >>> codes = enc.feed(wave_chunk)   # [B, 1, n*1920] -> [B, 32, n]
    """

    def __init__(self, codec, batch: int = 1):
        self.codec = codec
        self.state = encode_state_init(codec.config, batch)
        # One jitted step per CODEC, not per wrapper: per-slot serving
        # builds many wrappers, and a fresh jax.jit per instance would
        # trace + compile the identical program once per slot.
        step = getattr(codec, "_stream_encode_jit", None)
        if step is None:
            step = jax.jit(
                lambda p, s, c: encode_step(
                    codec.config, p, s, c, codec.num_codebooks
                )
            )
            codec._stream_encode_jit = step
        self._step = step

    def feed(self, wave) -> np.ndarray:
        codes, self.state = self._step(self.codec.params, self.state,
                                       jnp.asarray(wave))
        return np.asarray(codes)

    def reset(self, batch: Optional[int] = None) -> None:
        b = batch or self.state["kv"]["k"].shape[1]
        self.state = encode_state_init(self.codec.config, b)


class StreamingMimiDecoder:
    """Stateful convenience wrapper: feed frames, get audio chunks.

    >>> dec = StreamingMimiDecoder(codec)
    >>> for frame in frames:           # [32] codes per 80 ms frame
    ...     chunk = dec.feed(frame[None, :, None])   # [B, 1, 1920]
    """

    def __init__(self, codec, batch: int = 1):
        self.codec = codec
        self.state = decode_state_init(codec.config, batch)
        # Shared per-codec jit (see StreamingMimiEncoder.__init__): a
        # 16-slot CSMServer builds 16 of these — one compile, not 16.
        step = getattr(codec, "_stream_decode_jit", None)
        if step is None:
            step = jax.jit(
                lambda p, s, c: decode_step(codec.config, p, s, c)
            )
            codec._stream_decode_jit = step
        self._step = step

    def feed(self, codes) -> np.ndarray:
        """``[B, Q, t]`` codes → ``[B, t*hop]`` new audio samples."""
        out, self.state = self._step(self.codec.params, self.state, jnp.asarray(codes))
        return np.asarray(out[:, 0, :])

    def reset(self, batch: Optional[int] = None) -> None:
        b = batch or self.state["kv"]["k"].shape[1]
        self.state = decode_state_init(self.codec.config, b)

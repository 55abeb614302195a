"""Streaming Mimi decode: chunked output must equal full-utterance decode."""

import numpy as np
import pytest

from csm_tpu.codec import MimiCodec
from csm_tpu.codec.streaming import StreamingMimiDecoder, decode_state_init, decode_step

from tests.test_codec_parity import mimi_pair  # noqa: F401  (fixture)


@pytest.mark.parametrize("chunks", [[1, 1, 1, 1, 1, 1], [2, 3, 1], [3, 3], [6]])
def test_streaming_matches_full_decode(mimi_pair, chunks):
    import jax.numpy as jnp

    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    total = sum(chunks)
    rng = np.random.default_rng(21)
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, total))

    full = codec.decode(codes[0])  # [T]

    dec = StreamingMimiDecoder(codec, batch=1)
    out = []
    pos = 0
    for c in chunks:
        out.append(dec.feed(codes[:, :, pos : pos + c])[0])
        pos += c
    streamed = np.concatenate(out)

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_streaming_reset(mimi_pair):
    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    rng = np.random.default_rng(22)
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, 2))

    dec = StreamingMimiDecoder(codec)
    a = dec.feed(codes)
    dec.feed(codes)
    dec.reset()
    b = dec.feed(codes)
    np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.slow
def test_streaming_batch(mimi_pair):
    """Batched streaming: per-stream outputs equal their solo decodes."""
    import jax.numpy as jnp

    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    rng = np.random.default_rng(23)
    codes = rng.integers(0, cfg.codebook_size, (3, cfg.num_quantizers, 4))

    state = decode_state_init(cfg, batch=3)
    out, _ = decode_step(cfg, params, state, jnp.asarray(codes))

    for b in range(3):
        solo = codec.decode(codes[b])
        np.testing.assert_allclose(np.asarray(out[b, 0]), solo, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("chunks", [[1, 1, 1, 1], [2, 2], [1, 3], [4]])
def test_streaming_encode_matches_full(mimi_pair, chunks):
    """Chunked encode (frame-aligned chunks) is token-exact vs full encode."""
    from csm_tpu.codec.streaming import StreamingMimiEncoder

    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    total_frames = sum(chunks)
    fs = cfg.frame_size
    rng = np.random.default_rng(41)
    t = np.arange(total_frames * fs) / cfg.sampling_rate
    wave = (0.4 * np.sin(2 * np.pi * 330 * t)
            + 0.1 * rng.standard_normal(total_frames * fs)).astype(np.float32)

    full = codec.encode(wave)  # [Q, total_frames]

    enc = StreamingMimiEncoder(codec)
    outs = []
    pos = 0
    for c in chunks:
        outs.append(enc.feed(wave[None, None, pos : pos + c * fs])[0])
        pos += c * fs
    streamed = np.concatenate(outs, axis=1)

    assert streamed.shape == full.shape
    np.testing.assert_array_equal(streamed, full)


def test_streaming_encode_chunk_alignment_error(mimi_pair):
    from csm_tpu.codec.streaming import StreamingMimiEncoder

    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    enc = StreamingMimiEncoder(codec)
    with pytest.raises(ValueError, match="frame_size"):
        enc.feed(np.zeros((1, 1, cfg.frame_size + 3), np.float32))


@pytest.mark.slow
def test_streaming_rope_rebase_long_stream(mimi_pair):
    """Past _ROPE_TABLE_POS transformer steps the state is rebased (cached
    keys rotated by a constant phase); outputs must be unchanged — the
    guarantee that exact chunked decode holds for unboundedly long streams
    (round-1 silently clamped positions after 8000 steps)."""
    import jax.numpy as jnp

    from csm_tpu.codec import streaming as S
    from csm_tpu.codec import MimiCodec

    cfg, _, params = mimi_pair
    codec = MimiCodec(cfg, params)
    rng = np.random.default_rng(5)
    warm = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, 3))
    probe = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, 2))

    dec = StreamingMimiDecoder(codec, batch=1)
    dec.feed(warm)
    state_lo = dec.state

    # Shift the same state to just under the table limit: advance pos and
    # rotate cached keys forward by the same D (RoPE phases stay coherent).
    kv = state_lo["kv"]
    pos = int(kv["pos"])
    D = S._ROPE_TABLE_POS - pos - 1
    cos_d, sin_d = S._rebase_rotation(cfg, -D)  # +D phase
    k = kv["k"]
    half = cfg.head_dim // 2
    rot = jnp.concatenate([-k[..., half:], k[..., :half]], axis=-1)
    kv_hi = {**kv, "k": (k * cos_d + rot * sin_d).astype(k.dtype),
             "pos": kv["pos"] + D}
    state_hi = {**state_lo, "kv": kv_hi}

    out_lo, new_lo = S.decode_step(cfg, codec.params, state_lo, jnp.asarray(probe))
    out_hi, new_hi = S.decode_step(cfg, codec.params, state_hi, jnp.asarray(probe))

    # The hi path crossed the limit -> it was rebased mid-step...
    assert int(new_hi["kv"]["pos"]) == int(new_lo["kv"]["pos"]) + D - S._ROPE_TABLE_POS // 2
    # ...and produced the same audio.
    np.testing.assert_allclose(
        np.asarray(out_hi), np.asarray(out_lo), rtol=2e-3, atol=2e-4
    )

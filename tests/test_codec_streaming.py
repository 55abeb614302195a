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

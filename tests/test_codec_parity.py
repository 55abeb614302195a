"""Mimi codec parity vs the HF torch ``MimiModel`` (CPU oracle, tiny config,
random weights): encode must be token-exact; decode waveform-close
(SURVEY §7 "Mimi port: encode parity must be token-exact or the whole
framing shifts")."""

import numpy as np
import pytest

from csm_tpu.codec import MimiCodec, MimiCodecConfig, mimi_params_from_state_dict


def make_mimi_pair(cfg):
    """Tiny random-weight HF ``MimiModel`` + converted JAX params for ``cfg``
    (shared by the parity tests here and the end-to-end recipe test)."""
    import torch
    from transformers import MimiConfig, MimiModel

    hf_cfg = MimiConfig(
        num_quantizers=cfg.num_quantizers,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        hidden_size=cfg.hidden_size,
        num_filters=cfg.num_filters,
        vector_quantization_hidden_dimension=cfg.vector_quantization_hidden_dimension,
        upsample_groups=cfg.upsample_groups,
        num_hidden_layers=cfg.num_hidden_layers,
        intermediate_size=cfg.intermediate_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        sliding_window=cfg.sliding_window,
        num_semantic_quantizers=cfg.num_semantic_quantizers,
        num_residual_layers=cfg.num_residual_layers,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MimiModel(hf_cfg).float().eval()
    # HF initializes codebook EMA state to embed_sum=0 / usage=1 → all-zero
    # centroids; give the codebooks real values for a meaningful test.
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k in list(sd.keys()):
        if k.endswith("embed_sum"):
            sd[k] = torch.randn(sd[k].shape, generator=gen)
    model.load_state_dict(sd)

    params = mimi_params_from_state_dict(model.state_dict(), cfg)
    return cfg, model, params


@pytest.fixture(scope="module")
def mimi_pair():
    return make_mimi_pair(MimiCodecConfig.tiny())


def _wave(n, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 24000.0
    base = 0.5 * np.sin(2 * np.pi * 220.0 * t)[None]
    noise = 0.1 * rng.standard_normal((batch, n))
    return (base + noise).astype(np.float32)


@pytest.mark.parametrize("n_samples", [960 * 4, 960 * 7 + 123, 2000])
def test_encode_token_exact(mimi_pair, n_samples):
    import torch

    cfg, model, params = mimi_pair
    wave = _wave(n_samples, seed=n_samples)

    with torch.no_grad():
        ref = model.encode(torch.from_numpy(wave)[:, None, :]).audio_codes.numpy()

    codec = MimiCodec(cfg, params)
    got = codec.encode(wave[0])
    assert got.shape == ref[0].shape
    np.testing.assert_array_equal(got, ref[0])


def test_encoder_embedding_close(mimi_pair):
    """Pre-quantization embeddings match closely (isolates conv/transformer
    from argmin tie-breaking)."""
    import torch

    from csm_tpu.codec.mimi import (
        _apply_plan, causal_conv1d, codec_transformer, downsample_spec, encoder_plan,
    )
    import jax.numpy as jnp

    cfg, model, params = mimi_pair
    wave = _wave(960 * 5, seed=3)

    with torch.no_grad():
        x = model.encoder(torch.from_numpy(wave)[:, None, :])
        x = model.encoder_transformer(x.transpose(1, 2)).last_hidden_state
        ref = model.downsample(x.transpose(1, 2)).numpy()

    x = _apply_plan(encoder_plan(cfg), params["encoder"], jnp.asarray(wave)[:, None, :])
    x = codec_transformer(cfg, params["encoder_transformer"], x.swapaxes(1, 2))
    got = np.asarray(
        causal_conv1d(x.swapaxes(1, 2), params["downsample"]["w"], None, downsample_spec(cfg))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("frames", [5, 7])  # decode transformer runs at 2×
def test_decode_waveform_close(mimi_pair, frames):
    import torch

    cfg, model, params = mimi_pair
    rng = np.random.default_rng(7)
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, frames))

    with torch.no_grad():
        ref = model.decode(torch.from_numpy(codes)).audio_values.numpy()

    codec = MimiCodec(cfg, params)
    got = codec.decode(codes[0])
    assert got.shape == ref[0, 0].shape
    np.testing.assert_allclose(got, ref[0, 0], rtol=1e-3, atol=1e-4)


def test_roundtrip_both_frameworks_agree(mimi_pair):
    """encode→decode through both stacks yields near-identical audio."""
    import torch

    cfg, model, params = mimi_pair
    wave = _wave(960 * 6, seed=9)
    codec = MimiCodec(cfg, params)

    codes = codec.encode(wave[0])
    with torch.no_grad():
        ref_audio = model.decode(torch.from_numpy(codes[None])).audio_values.numpy()
    got_audio = codec.decode(codes)
    np.testing.assert_allclose(got_audio, ref_audio[0, 0], rtol=1e-3, atol=1e-4)


def test_partial_quantizers(mimi_pair):
    """num_codebooks < num_quantizers (the set_num_codebooks path,
    ``train.py:366``)."""
    import torch

    cfg, model, params = mimi_pair
    wave = _wave(960 * 4, seed=11)

    with torch.no_grad():
        ref = model.encode(
            torch.from_numpy(wave)[:, None, :], num_quantizers=4
        ).audio_codes.numpy()

    codec = MimiCodec(cfg, params)
    codec.set_num_codebooks(4)
    got = codec.encode(wave[0])
    assert got.shape[0] == 4
    np.testing.assert_array_equal(got, ref[0])


def test_sliding_window_active(mimi_pair):
    """The moshi-true sliding window changes results beyond the window (the
    HF 4.57 eager port drops it — documented divergence for >window inputs)."""
    import dataclasses

    from csm_tpu.codec.mimi import codec_transformer
    import jax.numpy as jnp

    cfg, _, params = mimi_pair
    T = cfg.sliding_window + 8
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, T, cfg.hidden_size)),
                    jnp.float32)
    with_sw = codec_transformer(cfg, params["encoder_transformer"], x)
    no_sw = codec_transformer(
        dataclasses.replace(cfg, sliding_window=None), params["encoder_transformer"], x
    )
    # identical inside the window...
    np.testing.assert_allclose(
        np.asarray(with_sw[:, : cfg.sliding_window]),
        np.asarray(no_sw[:, : cfg.sliding_window]),
        rtol=1e-5, atol=1e-6,
    )
    # ...different beyond it
    assert np.abs(np.asarray(with_sw[:, -1]) - np.asarray(no_sw[:, -1])).max() > 0


def test_frame_rate_math(mimi_pair):
    """12.5 Hz framing: 1920 samples per frame for the default config; the
    tiny config keeps the 960-sample transformer hop and ×2 downsample."""
    cfg, model, params = mimi_pair
    codec = MimiCodec(cfg, params)
    codes = codec.encode(_wave(960 * 8, seed=13)[0])
    assert codes.shape[1] == 4  # 8 encoder steps → ÷2 → 4 frames


def test_random_params_shape_identical(mimi_pair):
    """``random_mimi_params`` must be pytree-shape-identical to the converted
    HF state dict — it stands in for real weights in the codec benchmarks
    (``bench.py`` codec RTF lines), so a shape drift would silently bench a
    different model."""
    import jax

    from csm_tpu.codec import random_mimi_params

    cfg, _, converted = mimi_pair
    rand = random_mimi_params(cfg, seed=3)

    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), converted)
    rand_shapes = jax.tree.map(lambda x: tuple(x.shape), rand)
    assert conv_shapes == rand_shapes

    # And it must actually run: encode → decode round trip on the tiny config.
    codec = MimiCodec(cfg, rand)
    wave = _wave(960 * 4, seed=17)[0]
    codes = codec.encode(wave)
    assert codes.shape == (cfg.num_quantizers, 2)
    out = codec.decode(codes)
    assert np.isfinite(out).all()

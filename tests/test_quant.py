"""W8A16 quantized backbone decode path (csm_tpu/ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm
from csm_tpu.ops.quant import prepare_quantized_backbone, qmm


def test_qmm_exact_w8a16_arithmetic():
    """qmm == bf16(x) against the int8 weights with fp32 accumulation and
    per-channel rescale — weight-only quantization, no activation quant."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    from csm_tpu.ops.fused_decoder import quantize_per_channel

    q, s = quantize_per_channel(w)
    got = qmm(x, q, s)

    xb = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32), np.float64)
    want = (xb @ np.asarray(q, np.float64)) * np.asarray(s, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    # And it approximates the float matmul to weight-int8 accuracy.
    exact = np.asarray(x @ w)
    err = np.abs(np.asarray(got) - exact) / (np.abs(exact).max() + 1e-9)
    assert err.max() < 0.05


def test_backbone_decode_step_quantized_close():
    """A cached 1-frame decode step with int8 backbone weights stays close
    to the bf16 path (the W8A16 accuracy contract)."""
    from csm_tpu.models.llama import KVCache

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    qbb = prepare_quantized_backbone(params, cfg)

    rng = np.random.default_rng(1)
    ids = np.zeros((1, 1, cfg.frame_width), np.int32)
    ids[..., :-1] = rng.integers(1, cfg.audio_vocab_size, (1, 1, 32))
    mask = np.zeros((1, 1, cfg.frame_width), np.float32)
    mask[..., :-1] = 1.0
    cache = KVCache.create(cfg.backbone, 1, 16, dtype=jnp.float32)

    h_ref, _ = csm.backbone_forward(params, cfg, jnp.asarray(ids),
                                    jnp.asarray(mask), cache=cache)
    h_q, _ = csm.backbone_forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask), cache=cache, qbb=qbb)
    ref = np.asarray(h_ref)
    diff = np.abs(np.asarray(h_q) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert diff < 0.05, diff


def test_generate_with_quantized_backbone():
    """generate_compiled(qbb=...) runs, is deterministic, and emits valid
    tokens; the bf16 prefill + int8 steps compose."""
    from csm_tpu.generation import generate_compiled

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    qbb = prepare_quantized_backbone(params, cfg)

    rng = np.random.default_rng(2)
    B, S = 1, 8
    ids = np.zeros((B, S, cfg.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, cfg.text_vocab_size, (B, S))
    mask = np.zeros((B, S, cfg.frame_width), np.float32)
    mask[..., -1] = 1.0

    out = []
    for _ in range(2):
        frames, n = generate_compiled(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            jnp.int32(S), jax.random.key(5),
            max_new_frames=3, temperature=1.0, topk=5, greedy=True,
            stop_on_all_zeros=False, qbb=qbb,
        )
        out.append(np.asarray(frames))
    np.testing.assert_array_equal(out[0], out[1])
    assert out[0].shape == (B, 3, cfg.audio_num_codebooks)
    assert (out[0] >= 0).all() and (out[0] < cfg.audio_vocab_size).all()

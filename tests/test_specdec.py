"""EXACT speculative decode (csm_tpu/ops/specdec.py): draft with the int8
fused kernel, verify with one teacher-forced bf16 XLA pass — output tokens
must equal the plain XLA decode path's, for greedy AND sampled modes, at any
draft quality (random-init int8 drafts mismatch constantly, which exercises
the re-draft loop hard).

Most tests use a small codebook count (loop mechanics are N-independent) so
the worst-case round count stays CPU-affordable in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.config import CSMConfig
from csm_tpu.generation import decode_frame
from csm_tpu.models import csm
from csm_tpu.ops.fused_decoder import decode_frame_fused, prepare_fused_decoder

pytestmark = pytest.mark.slow


def _mk(N=8):
    cfg = CSMConfig.tiny(audio_num_codebooks=N)
    params = csm.init_params(jax.random.key(0), cfg, jnp.bfloat16)
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, cfg))(params)
    return cfg, params, qdec


def _frame_inputs(cfg, params, B, seed=0):
    rng = np.random.default_rng(seed)
    D = cfg.backbone.hidden_size
    last_h = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    c0_logits = (last_h @ params["codebook0_head"]).astype(jnp.float32)
    return last_h, c0_logits


@pytest.mark.parametrize("seed", [0, 3])
def test_specdec_equals_xla_greedy(seed):
    cfg, params, qdec = _mk()
    last_h, c0lg = _frame_inputs(cfg, params, 1, seed)
    f_ref = jax.jit(lambda p, h, lg: decode_frame(
        p, cfg, h, lg, jax.random.key(1), 1.0, 5, True
    ))
    f_spec = jax.jit(lambda p, q, h, lg: decode_frame(
        p, cfg, h, lg, jax.random.key(1), 1.0, 5, True, qdec=q, specdec=True
    ))
    ref = f_ref(params, last_h, c0lg)
    out = f_spec(params, qdec, last_h, c0lg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_specdec_equals_xla_sampled():
    """Sampled mode: the verify applies the same temperature/top-k/Gumbel
    draw (same keys) to the exact logits, so tokens match the XLA path's."""
    cfg, params, qdec = _mk()
    last_h, c0lg = _frame_inputs(cfg, params, 1, 7)
    key = jax.random.key(42)
    ref = jax.jit(lambda p, h, lg: decode_frame(
        p, cfg, h, lg, key, 0.8, 5, False
    ))(params, last_h, c0lg)
    out = jax.jit(lambda p, q, h, lg: decode_frame(
        p, cfg, h, lg, key, 0.8, 5, False, qdec=q, specdec=True
    ))(params, qdec, last_h, c0lg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_specdec_batched_per_stream():
    """B=2 with per-stream keys: each row equals the XLA path's row (rows
    hit their first mismatch at different positions, exercising the per-row
    verified-prefix bookkeeping)."""
    cfg, params, qdec = _mk()
    B = 2
    last_h, c0lg = _frame_inputs(cfg, params, B, 11)
    keys = jax.random.split(jax.random.key(5), B)
    ref = jax.jit(lambda p, h, lg: decode_frame(
        p, cfg, h, lg, keys, 1.0, 4, False
    ))(params, last_h, c0lg)
    out = jax.jit(lambda p, q, h, lg: decode_frame(
        p, cfg, h, lg, keys, 1.0, 4, False, qdec=q, specdec=True
    ))(params, qdec, last_h, c0lg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_forced_tokens_pass_through():
    """decode_frame_fused with a fully-forced token matrix returns exactly
    those tokens (the specdec re-draft contract)."""
    cfg, params, qdec = _mk()
    N = cfg.audio_num_codebooks
    last_h, c0lg = _frame_inputs(cfg, params, 1, 2)
    rng = np.random.default_rng(0)
    forced = jnp.asarray(
        rng.integers(0, cfg.audio_vocab_size, (1, N)), jnp.int32
    )
    out = jax.jit(lambda p, q, h, lg, f: decode_frame_fused(
        p, q, cfg, h, lg, jax.random.key(0), 1.0, 5, False, forced=f
    ))(params, qdec, last_h, c0lg, forced)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(forced))


def test_forced_partial_matches_unforced_prefix_consistency():
    """Forcing a prefix to the tokens an unforced run produced leaves the
    whole frame unchanged (determinism of the draft given its prefix)."""
    cfg, params, qdec = _mk()
    N = cfg.audio_num_codebooks
    last_h, c0lg = _frame_inputs(cfg, params, 1, 4)
    key = jax.random.key(9)
    f = jax.jit(lambda p, q, h, lg, fo: decode_frame_fused(
        p, q, cfg, h, lg, key, 1.0, 5, False, forced=fo
    ))
    none = jnp.full((1, N), -1, jnp.int32)
    base = f(params, qdec, last_h, c0lg, none)
    half = jnp.where(jnp.arange(N)[None, :] < N // 2, base, -1)
    again = f(params, qdec, last_h, c0lg, half.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(again), np.asarray(base))


def test_specdec_full_codebook_count():
    """One N=32 greedy run (the real config's loop depth) — worst case ~32
    re-draft rounds on random-init drafts; gated on exact equality."""
    cfg, params, qdec = _mk(N=32)
    last_h, c0lg = _frame_inputs(cfg, params, 1, 13)
    ref = jax.jit(lambda p, h, lg: decode_frame(
        p, cfg, h, lg, jax.random.key(1), 1.0, 5, True
    ))(params, last_h, c0lg)
    out = jax.jit(lambda p, q, h, lg: decode_frame(
        p, cfg, h, lg, jax.random.key(1), 1.0, 5, True, qdec=q, specdec=True
    ))(params, qdec, last_h, c0lg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_model_api_exact_generate():
    """CSMModel.exact().generate equals the plain bf16 model's greedy
    generation at tiny scale (the class-API wiring of the exact tier:
    qsb16 backbone dispatch + specdec decode, interpret-mode on CPU)."""
    import jax.numpy as jnp

    from csm_tpu.model_api import CSMModel

    cfg = CSMConfig.tiny(audio_num_codebooks=8)
    params = csm.init_params(jax.random.key(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(1)
    B, S = 1, 8
    ids = np.zeros((B, S, cfg.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, cfg.text_vocab_size, (B, S))
    mask = np.zeros((B, S, cfg.frame_width), np.float32)
    mask[..., -1] = 1.0

    plain = CSMModel(cfg, params).generate(
        ids, mask, max_new_frames=3, greedy=True,
        stop_on_all_zeros=False, rng=jax.random.key(7),
    )
    exact = CSMModel(cfg, params).exact().generate(
        ids, mask, max_new_frames=3, greedy=True,
        stop_on_all_zeros=False, rng=jax.random.key(7),
    )
    np.testing.assert_array_equal(exact, plain)

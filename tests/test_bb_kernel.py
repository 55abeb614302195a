"""Streamed-weight backbone decode-step kernel (csm_tpu/ops/bb_kernel.py).

The oracle is :func:`csm_tpu.ops.bb_kernel.emulate_bb_decode_step`, a
pure-JAX replica of the kernel's exact chunked arithmetic.  Both sides run
UNDER JIT (XLA's FMA contraction differs between jitted and eager programs,
so eager-vs-jit comparisons are not bit-stable); the kernel runs in
interpreter mode on CPU.  A separate hardware script
(scripts/check_bb_hw.py) retires the Mosaic-compilation risk on the chip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.config import CSMConfig, LlamaConfig
from csm_tpu.models import csm
from csm_tpu.models.llama import KVCache
from csm_tpu.ops import bb_kernel as bk


# Hardware checks pin these paths on the real chip each round; the
# CPU oracle here is thorough but slow (interpret-mode Pallas oracle).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    qsb = jax.jit(lambda p: bk.prepare_streamed_backbone(p, cfg))(params)
    return cfg, params, qsb


@pytest.fixture(scope="module")
def setup4():
    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    qsb4 = jax.jit(lambda p: bk.prepare_streamed_backbone(p, cfg, bits=4))(params)
    return cfg, params, qsb4


def _inputs(cfg, B, W, seed=0, partial_valid=True):
    rng = np.random.default_rng(seed)
    bcfg = cfg.backbone
    h0 = jnp.asarray(rng.standard_normal((B, bcfg.hidden_size)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((B, bcfg.head_dim)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((B, bcfg.head_dim)), jnp.float32)
    if partial_valid:
        valid = rng.random((B, W)) < 0.6
    else:
        valid = np.ones((B, W), bool)
    bias = jnp.where(jnp.asarray(valid), 0.0, -1e9).astype(jnp.float32)
    shape = (bcfg.num_hidden_layers, B, W, bcfg.num_key_value_heads, bcfg.head_dim)
    kc = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    return h0, cos, sin, bias, kc, vc


@pytest.mark.parametrize("B,W,partial", [(1, 8, False), (2, 16, True), (4, 24, True)])
def test_kernel_matches_emulator(setup, B, W, partial):
    """Interpret-mode kernel is bit-exact against the jitted emulator."""
    cfg, params, qsb = setup
    args = _inputs(cfg, B, W, seed=B, partial_valid=partial)
    out_k = bk.bb_decode_step(qsb, cfg, *args, interpret=True)
    emu = jax.jit(lambda q, *a: bk.emulate_bb_decode_step(q, cfg, *a))
    out_e = emu(qsb, *args)
    for name, a, b in zip(("normed_h", "c0_logits", "new_k", "new_v"), out_k, out_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_matches_bf16_path_closely(setup):
    """The kernel's decode step stays within int8-weight accuracy of the
    bf16 XLA path (same contract as the W8A16 backbone in test_quant)."""
    cfg, params, qsb = setup
    B, W = 2, 16
    rng = np.random.default_rng(7)
    ids = np.zeros((B, 1, cfg.frame_width), np.int32)
    ids[..., :-1] = rng.integers(1, cfg.audio_vocab_size, (B, 1, 32))
    mask = np.zeros((B, 1, cfg.frame_width), np.float32)
    mask[..., :-1] = 1.0
    cache = KVCache.create(cfg.backbone, B, W, dtype=jnp.bfloat16)
    # half-filled window with random (but valid) history
    fill = W // 2
    cache = cache.replace(
        k=cache.k.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.k[:, :, :fill].shape), jnp.bfloat16)
        ),
        v=cache.v.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.v[:, :, :fill].shape), jnp.bfloat16)
        ),
        valid=cache.valid.at[:, :fill].set(True),
        index=jnp.int32(fill),
    )

    ref = csm.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask), cache=cache)

    h0 = csm.embed_frames(params, cfg, jnp.asarray(ids), jnp.asarray(mask))[:, 0, :]
    from csm_tpu.ops.rope import compute_rope_table

    rope = compute_rope_table(cfg.backbone, cfg.max_seq_len)
    pos = jnp.full((B,), fill, jnp.int32)
    cos = jnp.take(rope[0], pos, axis=0)
    sin = jnp.take(rope[1], pos, axis=0)
    bias = jnp.where(cache.valid, 0.0, -1e9).astype(jnp.float32)
    nh, lg, nk, nv = bk.bb_decode_step(
        qsb, cfg, h0, cos, sin, bias, cache.k, cache.v, interpret=True
    )

    ref_h = np.asarray(ref.last_hidden_state, np.float64)
    diff_h = np.abs(np.asarray(nh, np.float64) - ref_h).max() / (np.abs(ref_h).max() + 1e-9)
    assert diff_h < 0.05, diff_h
    ref_lg = np.asarray(ref.logits, np.float64)
    diff_lg = np.abs(np.asarray(lg, np.float64) - ref_lg).max() / (np.abs(ref_lg).max() + 1e-9)
    assert diff_lg < 0.05, diff_lg
    # greedy c0 decision matches at tiny scale
    assert (np.argmax(np.asarray(lg), -1) == np.argmax(ref_lg, -1)).all()

    # new K/V rows match the XLA path's cache writes at the same slot
    new_k_ref = np.asarray(ref.cache.k)[:, :, fill]  # [L, B, nkv, hd]
    rel = np.abs(np.asarray(nk, np.float64) - new_k_ref.astype(np.float64)).max()
    rel /= np.abs(new_k_ref).max() + 1e-9
    assert rel < 0.05, rel


@pytest.mark.parametrize("B,W,partial", [(1, 8, False), (2, 16, True)])
def test_int4_kernel_matches_emulator(setup4, B, W, partial):
    """W4A16 mode: interpret-mode kernel (arithmetic nibble unpack) is
    bit-exact against the jitted emulator (same unpack via XLA shifts)."""
    cfg, params, qsb4 = setup4
    assert qsb4["w"]["wqkv"].dtype == jnp.int8  # row-PACKED nibbles
    assert qsb4["w"]["wqkv"].shape[1] == cfg.backbone.hidden_size // 2
    args = _inputs(cfg, B, W, seed=B + 10, partial_valid=partial)
    out_k = bk.bb_decode_step(qsb4, cfg, *args, interpret=True)
    emu = jax.jit(lambda q, *a: bk.emulate_bb_decode_step(q, cfg, *a))
    out_e = emu(qsb4, *args)
    for name, a, b in zip(("normed_h", "c0_logits", "new_k", "new_v"), out_k, out_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.fixture(scope="module")
def setup16():
    """EXACT bf16 tier: bf16 params (the shipped inference dtype — the
    tier's contract is against the bf16 XLA decode path)."""
    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg, jnp.bfloat16)
    qsb16 = jax.jit(
        lambda p: bk.prepare_streamed_backbone(p, cfg, bits=16)
    )(params)
    return cfg, params, qsb16


@pytest.mark.parametrize("B,W,partial", [(1, 8, False), (2, 16, True)])
def test_exact_kernel_matches_emulator(setup16, B, W, partial):
    """EXACT bf16 tier: interpret-mode kernel is bit-exact against the
    jitted emulator (same rounding points, same one-hot movements)."""
    cfg, params, qsb16 = setup16
    assert qsb16["w"]["wqkv"].dtype == jnp.bfloat16
    assert "nw" in qsb16 and "s" not in qsb16
    args = _inputs(cfg, B, W, seed=B + 20, partial_valid=partial)
    out_k = bk.bb_decode_step(qsb16, cfg, *args, interpret=True)
    emu = jax.jit(lambda q, *a: bk.emulate_bb_decode_step(q, cfg, *a))
    out_e = emu(qsb16, *args)
    for name, a, b in zip(("normed_h", "c0_logits", "new_k", "new_v"), out_k, out_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_exact_matches_bf16_path_greedy(setup16, seed):
    """The EXACT tier's decode step reproduces the bf16 XLA path's greedy
    c0 picks (the tier's whole point: north-star throughput WITH parity),
    with logits agreeing to bf16-ulp scale — not the int8 tiers' ~15%
    quantization envelope."""
    cfg, params, qsb16 = setup16
    B, W = 4, 16
    rng = np.random.default_rng(seed)
    ids = np.zeros((B, 1, cfg.frame_width), np.int32)
    ids[..., :-1] = rng.integers(1, cfg.audio_vocab_size, (B, 1, 32))
    mask = np.zeros((B, 1, cfg.frame_width), np.float32)
    mask[..., :-1] = 1.0
    cache = KVCache.create(cfg.backbone, B, W, dtype=jnp.bfloat16)
    fill = W // 2
    cache = cache.replace(
        k=cache.k.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.k[:, :, :fill].shape), jnp.bfloat16)
        ),
        v=cache.v.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.v[:, :, :fill].shape), jnp.bfloat16)
        ),
        valid=cache.valid.at[:, :fill].set(True),
        index=jnp.int32(fill),
    )

    ref = jax.jit(
        lambda p, i, m, c: csm.forward(p, cfg, i, m, cache=c)
    )(params, jnp.asarray(ids), jnp.asarray(mask), cache)
    out = jax.jit(
        lambda p, q, i, m, c: csm.forward(p, cfg, i, m, cache=c, qsb=q)
    )(params, qsb16, jnp.asarray(ids), jnp.asarray(mask), cache)

    ref_lg = np.asarray(ref.logits, np.float64)
    lg = np.asarray(out.logits, np.float64)
    rel = np.abs(lg - ref_lg).max() / (np.abs(ref_lg).max() + 1e-9)
    assert rel < 2e-2, rel  # bf16-ulp scale, not quantization scale
    assert (np.argmax(lg, -1) == np.argmax(ref_lg, -1)).all()

    ref_h = np.asarray(ref.last_hidden_state, np.float64)
    nh = np.asarray(out.last_hidden_state, np.float64)
    rel_h = np.abs(nh - ref_h).max() / (np.abs(ref_h).max() + 1e-9)
    assert rel_h < 2e-2, rel_h

    # new K/V rows: the kernel rounds exactly where the XLA path casts, so
    # the cache writes agree to bf16-ulp scale too.
    new_k_ref = np.asarray(ref.cache.k)[:, :, fill].astype(np.float64)
    new_k = np.asarray(out.cache.k)[:, :, fill].astype(np.float64)
    rel_k = np.abs(new_k - new_k_ref).max() / (np.abs(new_k_ref).max() + 1e-9)
    assert rel_k < 2e-2, rel_k


def test_int4_pack_unpack_roundtrip():
    """pack_int4_rows / unpack_int4_rows are exact inverses over the full
    nibble range, including -8."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (3, 16, 128)), jnp.int8)
    p = bk.pack_int4_rows(q)
    assert p.shape == (3, 8, 128) and p.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(bk.unpack_int4_rows(p)), np.asarray(q))


def test_int4_matches_bf16_path_roughly(setup4):
    """The W4A16 decode step tracks the bf16 XLA path within the int4
    weight-quantization budget at tiny scale (greedy c0 agreement is a
    real-weights question — scripts/fetch_and_verify.py)."""
    cfg, params, qsb4 = setup4
    B, W = 2, 16
    rng = np.random.default_rng(7)
    ids = np.zeros((B, 1, cfg.frame_width), np.int32)
    ids[..., :-1] = rng.integers(1, cfg.audio_vocab_size, (B, 1, 32))
    mask = np.zeros((B, 1, cfg.frame_width), np.float32)
    mask[..., :-1] = 1.0
    cache = KVCache.create(cfg.backbone, B, W, dtype=jnp.bfloat16)
    fill = W // 2
    cache = cache.replace(
        k=cache.k.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.k[:, :, :fill].shape), jnp.bfloat16)
        ),
        v=cache.v.at[:, :, :fill].set(
            jnp.asarray(rng.standard_normal(cache.v[:, :, :fill].shape), jnp.bfloat16)
        ),
        valid=cache.valid.at[:, :fill].set(True),
        index=jnp.int32(fill),
    )
    ref = csm.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask), cache=cache)
    out = jax.jit(
        lambda p, q, i, m, c: csm.forward(p, cfg, i, m, cache=c, qsb=q)
    )(params, qsb4, jnp.asarray(ids), jnp.asarray(mask), cache)
    ref_h = np.asarray(ref.last_hidden_state, np.float64)
    diff = np.abs(np.asarray(out.last_hidden_state, np.float64) - ref_h).max()
    assert diff / (np.abs(ref_h).max() + 1e-9) < 0.15  # int4 budget


def test_generation_with_streamed_backbone(setup):
    """generate_compiled(qsb=...) runs end-to-end (interpret mode on CPU),
    is deterministic, and produces in-range tokens."""
    from csm_tpu.generation import generate_compiled

    cfg, params, qsb = setup
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
            stop_on_all_zeros=False, qsb=qsb,
        )
        out.append(np.asarray(frames))
    np.testing.assert_array_equal(out[0], out[1])
    assert out[0].shape == (B, 3, cfg.audio_num_codebooks)
    assert (out[0] >= 0).all() and (out[0] < cfg.audio_vocab_size).all()


def test_streamed_decode_masked_and_overflow_slots(setup):
    """Review regressions: (1) an all-masked S=1 frame is recorded INVALID
    in the cache (the XLA path's validity contract); (2) a slot whose
    position ran past the RoPE table (a finished serving slot stepping on
    garbage) yields FINITE outputs — the OOB take must clip, not NaN-fill,
    because one NaN K-row would spread through the merged window into every
    stream's attention."""
    cfg, params, qsb = setup
    from csm_tpu.models.llama import KVCache

    B, W = 2, 16
    rng = np.random.default_rng(3)
    cache = KVCache.create(cfg.backbone, B, W, dtype=jnp.bfloat16)
    cache = cache.replace(
        k=jnp.asarray(rng.standard_normal(cache.k.shape), jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal(cache.v.shape), jnp.bfloat16),
        valid=cache.valid.at[:, :3].set(True),
        index=jnp.asarray([3, cfg.max_seq_len + 5], jnp.int32),
    )
    ids = np.zeros((B, 1, cfg.frame_width), np.int32)
    ids[..., :-1] = rng.integers(1, cfg.audio_vocab_size, (B, 1, 32))
    mask = np.zeros((B, 1, cfg.frame_width), np.float32)
    mask[1, ..., :-1] = 1.0  # row 0: fully masked frame; row 1: audio frame

    out = jax.jit(
        lambda p, q, i, m, c: csm.forward(p, cfg, i, m, cache=c, qsb=q)
    )(params, qsb, jnp.asarray(ids), jnp.asarray(mask), cache)

    # (1) row 0's written slot is invalid, matching the XLA path.
    ref = jax.jit(
        lambda p, i, m, c: csm.forward(p, cfg, i, m, cache=c)
    )(params, jnp.asarray(ids), jnp.asarray(mask),
      cache.replace(index=jnp.asarray([3, W - 1], jnp.int32)))
    assert not bool(out.cache.valid[0, 3])
    assert not bool(ref.cache.valid[0, 3])
    # (2) finite everywhere despite row 1's out-of-table position.
    assert np.isfinite(np.asarray(out.logits)).all()
    assert np.isfinite(np.asarray(out.last_hidden_state, np.float32)).all()

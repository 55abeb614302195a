"""Pallas flash-attention kernel vs the XLA reference attention
(SURVEY §4.3: unit tests per kernel).  Runs in interpreter mode on CPU."""

import numpy as np
import pytest

from csm_tpu.config import LlamaConfig


def _naive(q, k, v, key_valid, causal=True):
    import jax.numpy as jnp

    from csm_tpu.models import llama

    B, S = q.shape[0], q.shape[1]
    T = k.shape[1]
    bias = llama.make_causal_bias(jnp.asarray(key_valid, bool), S) if causal else None
    out = llama._attention(q, k, v, bias)
    return out.reshape(B, S, q.shape[2], q.shape[3])


@pytest.mark.parametrize("B,S,T,nq,nkv,hd,bq,bk", [
    (2, 16, 16, 4, 2, 16, 8, 8),      # GQA, square
    (1, 32, 32, 2, 2, 32, 16, 16),    # MHA
    (1, 16, 64, 4, 1, 16, 16, 16),    # prefill into a larger cache window
])
def test_flash_matches_naive(B, S, T, nq, nkv, hd, bq, bk):
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, nkv, hd)), jnp.float32)
    # key validity: first rows valid up to a ragged boundary; for T > S the
    # tail (unwritten cache slots) is invalid
    key_valid = np.zeros((B, T), np.int32)
    for b in range(B):
        key_valid[b, : S - b] = 1
    kv = jnp.asarray(key_valid)

    got = flash_attention(q, k, v, kv, causal=True, block_q=bq, block_k=bk,
                          interpret=True)
    # naive path needs [B, 1, 1, S, T] bias built from the same validity
    import jax.numpy as jnp

    from csm_tpu.models import llama

    bias = llama.make_causal_bias(kv.astype(bool), S)
    ref = llama._attention(q, k, v, bias).reshape(B, S, nq, hd)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_fully_masked_rows_finite_uniform():
    """Fully-masked query rows (left padding — excluded from attention and
    loss downstream) must stay FINITE, softmaxing to uniform attention over
    the keys the causal-skipped grid visits.  (The XLA path's uniform
    fallback spans all T keys; with block skipping the span is the causal
    triangle — an implementation-defined value on garbage rows either way.)
    Valid rows are covered exactly by test_flash_matches_naive."""
    import jax.numpy as jnp

    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    B, S, nq, nkv, hd = 1, 16, 2, 1, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    key_valid = jnp.zeros((B, S), jnp.int32)  # nothing valid

    got = np.asarray(
        flash_attention(q, k, v, key_valid, block_q=8, block_k=8, interpret=True)
    )
    assert np.isfinite(got).all()
    # Row 0 visits only key block 0 -> uniform mean of its 8 values.
    np.testing.assert_allclose(
        got[0, 0, 0], np.asarray(v[0, :8, 0].mean(axis=0)), rtol=1e-5, atol=1e-5
    )
    # Rows in the last q block visit every key block -> global uniform mean.
    np.testing.assert_allclose(
        got[0, -1, 0], np.asarray(v[0, :, 0].mean(axis=0)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_end_to_end_forward_flash_vs_xla():
    """Full backbone forward: flash path output equals the XLA path."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops import attention

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    B, S = 1, 16
    ids = np.zeros((B, S, 33), np.int64)
    ids[..., 32] = rng.integers(1, cfg.text_vocab_size, (B, S))
    mask = np.zeros((B, S, 33), np.float32)
    mask[..., 32] = 1

    ref = csm.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))

    # Force the flash path (interpret via monkeypatched flash call is heavy;
    # instead run the kernel in interpret mode through the dispatcher).
    from csm_tpu.ops import flash_attention as fa

    orig = fa.flash_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    fa_mod_attr = fa.flash_attention
    fa.flash_attention = interp
    attention.set_attention_impl("flash")
    try:
        got = csm.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    finally:
        attention.set_attention_impl("auto")
        fa.flash_attention = fa_mod_attr

    np.testing.assert_allclose(
        np.asarray(got.logits), np.asarray(ref.logits), rtol=1e-4, atol=1e-5
    )


def test_flash_vjp_matches_xla_grads():
    """Gradcheck (VERDICT r2 next #1): gradients through the Pallas flash
    kernel (custom_vjp backward kernels) equal the XLA attention path's
    gradients for q, k, v — including GQA group folding, causal masking,
    ragged key validity (left padding), and zero-cotangent padded rows."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models import llama
    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(7)
    B, S, nq, nkv, hd = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    # Row 1 left-padded: first 16 positions invalid.
    key_valid = np.ones((B, S), np.int32)
    key_valid[1, :16] = 0
    kv = jnp.asarray(key_valid)
    # Query weights: zero on padded rows (their dO must be zero, as the
    # training loss masks padding), random elsewhere — mixes every output.
    w = jnp.asarray(
        rng.standard_normal((B, S, nq, hd)) * key_valid[:, :, None, None],
        jnp.float32,
    )

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv, causal=True, block_q=16,
                              block_k=16, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        bias = llama.make_causal_bias(kv.astype(bool), S)
        out = llama._attention(q, k, v, bias).reshape(B, S, nq, hd)
        return jnp.sum(out * w)

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_flash_vjp_dead_rows_zero_grads():
    """Fully-masked query rows with a NONZERO cotangent must contribute
    exactly zero to dq/dk/dv (not count-inflated values — the fp32 LSE at
    −1e9 loses the log-count term, so exp(s−lse) would be 1 per visited
    key without the dead-row guard)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models import llama
    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(9)
    B, S, nq, nkv, hd = 1, 32, 2, 1, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    key_valid = np.ones((B, S), np.int32)
    key_valid[0, :16] = 0  # rows 0..15 are dead (no visible keys, causal)
    kv = jnp.asarray(key_valid)
    w = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)  # ≠0 everywhere

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv, causal=True, block_q=8,
                              block_k=8, interpret=True)
        return jnp.sum(out * w)

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(g)).all() for g in (gq, gk, gv))
    # dead query rows: zero dq
    np.testing.assert_array_equal(np.asarray(gq)[0, :16], 0.0)
    # dk/dv must equal the XLA grads computed with the dead rows' cotangent
    # zeroed — i.e. dead rows contribute nothing (XLA would instead spread
    # their cotangent uniformly into dv; both values are garbage, ours is 0).
    w_masked = w * jnp.asarray(key_valid, jnp.float32)[:, :, None, None]

    def loss_xla(q, k, v):
        bias = llama.make_causal_bias(kv.astype(bool), S)
        out = llama._attention(q, k, v, bias).reshape(B, S, nq, hd)
        return jnp.sum(out * w_masked)

    _, xk, xv = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(xk), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(xv), rtol=1e-4,
                               atol=1e-5)


def test_flash_vjp_noncausal_full_window():
    """Backward also correct without causal masking (the i_first/j_last
    skipping degenerates to the full square)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models import llama
    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(8)
    B, S, nq, nkv, hd = 1, 32, 2, 1, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    kv = jnp.ones((B, S), jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv, causal=False, block_q=16,
                              block_k=16, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        ones = jnp.zeros((B, 1, 1, S, S), jnp.float32)  # no masking
        out = llama._attention(q, k, v, ones).reshape(B, S, nq, hd)
        return jnp.sum(out * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_remat_grads_match_no_remat():
    """jax.checkpoint over the layer scan changes memory, not math: the
    train-path gradients with remat on equal the un-remat'ed gradients."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    ids = np.zeros((1, 16, 33), np.int64)
    ids[..., 32] = rng.integers(1, cfg.text_vocab_size, (1, 16))
    mask = np.zeros((1, 16, 33), np.float32)
    mask[..., 32] = 1

    def loss(p, remat, policy="nothing"):
        return csm.forward(
            p, cfg, jnp.asarray(ids), jnp.asarray(mask),
            labels=jnp.asarray(ids), max_decoder_frames=4, remat=remat,
            remat_policy=policy,
        ).loss

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, True, "dots"))(params)
    for a, b, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1),
                       jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_training_grad_path_skips_flash():
    """use_flash=False remains a working escape hatch: gradients flow on the
    XLA path even with the flash impl forced (this guarded a real crash in
    rounds 1-2 when the kernel had no VJP; the switch is now an A-B lever)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops import attention

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    ids = np.zeros((1, 16, 33), np.int64)
    ids[..., 32] = rng.integers(1, cfg.text_vocab_size, (1, 16))
    mask = np.zeros((1, 16, 33), np.float32)
    mask[..., 32] = 1

    attention.set_attention_impl("flash")
    try:
        def loss(p):
            return csm.forward(
                p, cfg, jnp.asarray(ids), jnp.asarray(mask),
                labels=jnp.asarray(ids), max_decoder_frames=4,
                use_flash=False,  # what make_train_step passes
            ).loss

        g = jax.grad(loss)(params)
    finally:
        attention.set_attention_impl("auto")
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_flash_q_offset_matches_full_kernel():
    """The q_offset path (sequence parallelism): running each query shard
    with ``q_offset = shard * S_local`` against the full K/V must reproduce
    the unsharded kernel BITWISE — same block_k-aligned key blocks visited
    in the same ascending order, so every online-softmax update is
    identical."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(7)
    B, S, nq, nkv, hd = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    valid = np.ones((B, S), np.int32)
    valid[:, :5] = 0  # left padding
    valid = jnp.asarray(valid)

    full = flash_attention(q, k, v, valid, block_q=16, block_k=16,
                           interpret=True)
    n_sh, S_loc = 4, S // 4
    for s in range(n_sh):
        out = flash_attention(
            q[:, s * S_loc:(s + 1) * S_loc], k, v, valid,
            block_q=16, block_k=16, interpret=True,
            q_offset=jnp.int32(s * S_loc),
        )
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(full[:, s * S_loc:(s + 1) * S_loc])
        )


def test_flash_q_offset_grads_match_full_kernel():
    """Gradients through the q_offset path: concatenating the per-shard
    outputs and differentiating must match the unsharded kernel's grads
    (dq bitwise — same per-row work; dk/dv to fp tolerance — cross-shard
    accumulation order differs)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(8)
    B, S, nq, nkv, hd = 1, 32, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    valid = jnp.ones((B, S), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)

    def loss_full(q, k, v):
        o = flash_attention(q, k, v, valid, block_q=8, block_k=8,
                            interpret=True)
        return jnp.sum(o * cot)

    def loss_sharded(q, k, v):
        outs = [
            flash_attention(q[:, s * 8:(s + 1) * 8], k, v, valid,
                            block_q=8, block_k=8, interpret=True,
                            q_offset=jnp.int32(s * 8))
            for s in range(4)
        ]
        return jnp.sum(jnp.concatenate(outs, axis=1) * cot)

    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_array_equal(np.asarray(g_full[0]), np.asarray(g_sh[0]))
    for a, b in zip(g_full[1:], g_sh[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_flash_attention_sp_shard_map_matches_full():
    """``flash_attention_sp`` under a real ``shard_map`` over the virtual
    CPU mesh's seq axis: forward equals the unsharded kernel bitwise;
    gradients match to fp tolerance (dk/dv psum-scatter order)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from csm_tpu.ops.flash_attention import flash_attention, flash_attention_sp
    from csm_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    mesh = make_mesh(data=1, model=1, seq=4)

    rng = np.random.default_rng(9)
    B, S, nq, nkv, hd = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
    valid = np.ones((B, S), np.int32)
    valid[:, :3] = 0
    valid = jnp.asarray(valid)

    from functools import partial

    sp = jax.shard_map(
        partial(flash_attention_sp, axis_name="seq", block_q=16, block_k=16,
                interpret=True),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    got = sp(q, k, v, valid)
    want = flash_attention(q, k, v, valid, block_q=16, block_k=16,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    cot = jnp.asarray(rng.standard_normal((B, S, nq, hd)), jnp.float32)
    g_sp = jax.grad(lambda *a: jnp.sum(sp(*a, valid) * cot),
                    argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(
        lambda *a: jnp.sum(flash_attention(
            *a, valid, block_q=16, block_k=16, interpret=True) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_full, g_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

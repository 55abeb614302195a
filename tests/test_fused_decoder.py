"""Tests for the fused VMEM-resident intra-frame decoder kernel.

The oracle is :func:`csm_tpu.ops.fused_decoder.emulate_decode_codebooks`, a
pure-JAX replica of the kernel's exact arithmetic (same int8 weights, same
fp32 accumulation, same bisection top-k, same Gumbel noise).  In interpreter
mode the kernel must match it bit-for-bit; on real TPU hardware greedy
agreement was verified at the full CSM-1B shape (see docs/ARCHITECTURE.md).

Reference behavior covered: the 31-step codebook loop of
``/root/reference/modeling_csm.py:555-576`` (prefill at :536-552).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm
from csm_tpu.ops import fused_decoder as fd
from csm_tpu.ops.sampling import sample_topk


# Hardware checks pin these paths on the real chip each round; the
# CPU oracle here is thorough but slow (interpret-mode Pallas oracle).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    config = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), config, jnp.float32)
    qdec = fd.prepare_fused_decoder(params, config)
    last_h = jax.random.normal(
        jax.random.key(1), (1, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(2), (1, config.audio_vocab_size), jnp.float32
    )
    # bf16-rounded, like the backbone head's output (the in-kernel c0
    # bisection's exactness contract).
    c0_logits = c0_logits.astype(jnp.bfloat16).astype(jnp.float32)
    return config, params, qdec, last_h, c0_logits


def test_quantize_per_channel_roundtrip():
    w = jax.random.normal(jax.random.key(0), (3, 16, 8), jnp.float32)
    q, s = fd.quantize_per_channel(w)
    assert q.dtype == jnp.int8 and s.shape == (3, 1, 8)
    recon = q.astype(jnp.float32) * s
    # Symmetric int8: worst-case error is half a quantization step.
    step = s[..., 0, :]
    assert float(jnp.max(jnp.abs(recon - w))) <= float(jnp.max(step)) * 0.51
    # Channel maxima hit ±127 exactly.
    assert int(jnp.max(jnp.abs(q))) == 127


def test_prepare_shapes(setup):
    config, params, qdec, *_ = setup
    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Va_pad = -(-Va // 128) * 128
    Dd = config.decoder.hidden_size
    assert qdec["audio_head"].shape == (N - 1, Dd, Va_pad)
    # Padding lanes are zero.
    assert float(jnp.abs(qdec["audio_head"][..., Va:]).max()) == 0.0
    rows = config.audio_embedding_rows
    assert qdec["proj_emb"].shape[0] == rows
    assert int(np.prod(qdec["proj_emb"].shape[1:])) == Dd
    # Pre-projection matches embed-then-project.
    want = params["audio_embeddings"][:5] @ params["projection"]
    got = qdec["proj_emb"].reshape(rows, Dd)[:5]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("greedy", [True, False])
def test_kernel_matches_emulator(setup, greedy):
    """Interpret-mode kernel is bit-exact against the pure-JAX emulator
    (all 32 codebooks — c0 sampling now lives in-kernel too)."""
    config, params, qdec, last_h, c0_logits = setup
    Va = config.audio_vocab_size
    N = config.audio_num_codebooks
    keys = jax.random.split(jax.random.key(42), N)
    if greedy:
        gumbel = jnp.zeros((N, 1, Va), jnp.float32)
    else:
        gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (1, Va), jnp.float32))(
            keys
        )
    x0 = (last_h @ params["projection"]).astype(jnp.float32)
    em = fd.emulate_decode_codebooks(
        qdec, config, x0, c0_logits, gumbel, 0.8, topk=10, greedy=greedy
    )
    kr = fd.fused_decode_codebooks(
        qdec, config, x0, c0_logits, gumbel, 0.8, topk=10, greedy=greedy,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(em), np.asarray(kr))
    # c0 equals the standard sampler's draw (bitwise on bf16-rounded
    # logits: the bisection finds lax.top_k's exact k-th value and the
    # Gumbel noise is the same keys[0] draw sample_topk would consume).
    c0_want = sample_topk(keys[0], c0_logits, 10, 0.8, greedy)
    assert int(np.asarray(kr)[0, 0]) == int(c0_want[0])
    # Tokens are in range.
    assert np.asarray(kr).min() >= 0 and np.asarray(kr).max() < Va


def test_decode_frame_fused_wrapper(setup):
    """The frame wrapper returns [1, 32] with c0 from the standard sampler."""
    config, params, qdec, last_h, c0_logits = setup
    out = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, jax.random.key(3),
        1.0, 10, True,
    )
    assert out.shape == (1, config.audio_num_codebooks)
    c0_want = sample_topk(
        jax.random.split(jax.random.key(3), 32)[0], c0_logits, 10, 1.0, True
    )
    assert int(out[0, 0]) == int(c0_want[0])
    # Deterministic under greedy.
    out2 = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, jax.random.key(3),
        1.0, 10, True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_bisection_topk_matches_lax_topk():
    """The in-kernel bit-bisection finds exactly lax.top_k's k-th value."""
    logits = jax.random.normal(jax.random.key(0), (1, 2051), jnp.float32)
    for k in (1, 5, 50, 2051):
        got = fd._sample_row(
            logits, jnp.zeros_like(logits), jnp.float32(1.0), k, False
        )
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        want = jnp.argmax(jnp.where(logits < kth, fd.NEG_INF, logits), axis=-1)
        assert int(got[0]) == int(want[0])


def test_generation_integration_with_qdec(setup):
    """generate_compiled(qdec=...) runs end-to-end and is deterministic."""
    from csm_tpu.generation import generate_compiled

    config, params, qdec, *_ = setup
    B, S = 1, 8
    ids = np.zeros((B, S, config.frame_width), np.int32)
    ids[..., -1] = 5
    mask = np.zeros((B, S, config.frame_width), np.float32)
    mask[..., -1] = 1.0
    out = []
    for i in range(2):
        frames, n = generate_compiled(
            params, config, jnp.asarray(ids), jnp.asarray(mask),
            jnp.int32(S), jax.random.key(9),
            max_new_frames=3, temperature=1.0, topk=5, greedy=True,
            stop_on_all_zeros=False, qdec=qdec,
        )
        out.append(np.asarray(frames))
    assert out[0].shape == (B, 3, config.audio_num_codebooks)
    np.testing.assert_array_equal(out[0], out[1])


def test_batched_kernel_rows_equal_solo_runs(setup):
    """The batched fused kernel (B>1) produces, per row, exactly the B=1
    per-stream result — batching is free of cross-stream interference (the
    property the batched serving aggregate and CSMServer rely on)."""
    config, params, qdec, *_ = setup
    B = 3
    last_h = jax.random.normal(
        jax.random.key(5), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(6), (B, config.audio_vocab_size), jnp.float32
    )
    keys = jax.random.split(jax.random.key(42), B)

    out_b = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, keys, 0.8, 5, False,
        interpret=True,
    )
    solo = np.stack([
        np.asarray(fd.decode_frame_fused(
            params, qdec, config, last_h[b:b+1], c0_logits[b:b+1],
            keys[b:b+1], 0.8, 5, False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out_b), solo)

    # Joint-key greedy batched mode also runs.
    out_g = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, jax.random.key(9),
        1.0, 5, True, interpret=True,
    )
    assert out_g.shape == (B, config.audio_num_codebooks)


def test_chunked_decode_past_validated_cap(setup):
    """Batches past MAX_VALIDATED_B split into sequential capped chunks
    (``decode_frame_fused``); per-stream keys must make each row bitwise
    equal to its solo run, and the joint-key mode must equal one unchunked
    call at the same B (the noise table is built at full B, then sliced).

    The streamed-w_down tier is pinned equal to chunking elsewhere
    (test_streamdown_*); here it is disabled so the chunk path itself
    stays exercised."""
    config, params, qdec, *_ = setup
    cap = fd.MAX_VALIDATED_B
    B = cap + 3  # one full chunk + a remainder chunk
    last_h = jax.random.normal(
        jax.random.key(11), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(12), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(13), B)

    orig_stream = fd.MAX_VALIDATED_B_STREAMDOWN
    fd.MAX_VALIDATED_B_STREAMDOWN = cap  # force the chunk path at B=11
    try:
        out = fd.decode_frame_fused(
            params, qdec, config, last_h, c0_logits, keys, 0.8, 5, False,
            interpret=True,
        )
        assert out.shape == (B, config.audio_num_codebooks)
        solo = np.stack([
            np.asarray(fd.decode_frame_fused(
                params, qdec, config, last_h[b:b+1], c0_logits[b:b+1],
                keys[b:b+1], 0.8, 5, False, interpret=True,
            ))[0]
            for b in range(B)
        ])
        np.testing.assert_array_equal(np.asarray(out), solo)
    finally:
        fd.MAX_VALIDATED_B_STREAMDOWN = orig_stream

    # Joint-key mode: chunking must not change the draw — compare against
    # a monkeypatched unchunked call at the same B (interpret mode has no
    # VMEM cap, so the monolithic program is runnable as the oracle).
    fd.MAX_VALIDATED_B_STREAMDOWN = cap
    try:
        joint = fd.decode_frame_fused(
            params, qdec, config, last_h, c0_logits, jax.random.key(21),
            0.8, 5, False, interpret=True,
        )
    finally:
        fd.MAX_VALIDATED_B_STREAMDOWN = orig_stream
    orig = fd.MAX_VALIDATED_B
    try:
        fd.MAX_VALIDATED_B = B
        mono = fd.decode_frame_fused(
            params, qdec, config, last_h, c0_logits, jax.random.key(21),
            0.8, 5, False, interpret=True,
        )
    finally:
        fd.MAX_VALIDATED_B = orig
    np.testing.assert_array_equal(np.asarray(joint), np.asarray(mono))


def test_streamdown_kernel_matches_resident(setup):
    """The streamed-w_down variant (w_down in HBM, 2-slot DMA ring) is
    bit-identical to the fully-resident kernel — same math, different
    residency — for sampled and greedy draws, at a batch inside the
    streamed tier (MAX_VALIDATED_B < B <= MAX_VALIDATED_B_STREAMDOWN)."""
    config, params, qdec, *_ = setup
    B = fd.MAX_VALIDATED_B + 2
    N, Va = config.audio_num_codebooks, config.audio_vocab_size
    x0 = jax.random.normal(
        jax.random.key(41), (B, config.decoder.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(42), (B, Va), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    gumbel = jax.random.gumbel(jax.random.key(43), (N, B, Va), jnp.float32)
    for greedy in (False, True):
        g = jnp.zeros_like(gumbel) if greedy else gumbel
        res = fd.fused_decode_codebooks(
            qdec, config, x0, c0_logits, g, 0.8, topk=5, greedy=greedy,
            interpret=True,
        )
        stream = fd.fused_decode_codebooks(
            qdec, config, x0, c0_logits, g, 0.8, topk=5, greedy=greedy,
            interpret=True, stream_down=True,
        )
        np.testing.assert_array_equal(np.asarray(res), np.asarray(stream))


def test_streamgu_kernel_matches_resident(setup):
    """The stream-everything variant (w_gu halves ALSO ringed from HBM —
    the B=32 single-program tier) is bit-identical to the resident kernel
    for sampled and greedy draws: the gate/up column-half dots accumulate
    exactly like the fused dot's column halves."""
    config, params, qdec, *_ = setup
    B = fd.MAX_VALIDATED_B_STREAMDOWN + 2
    N, Va = config.audio_num_codebooks, config.audio_vocab_size
    x0 = jax.random.normal(
        jax.random.key(61), (B, config.decoder.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(62), (B, Va), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    gumbel = jax.random.gumbel(jax.random.key(63), (N, B, Va), jnp.float32)
    for greedy in (False, True):
        g = jnp.zeros_like(gumbel) if greedy else gumbel
        res = fd.fused_decode_codebooks(
            qdec, config, x0, c0_logits, g, 0.8, topk=5, greedy=greedy,
            interpret=True,
        )
        stream = fd.fused_decode_codebooks(
            qdec, config, x0, c0_logits, g, 0.8, topk=5, greedy=greedy,
            interpret=True, stream_down=True, stream_gu=True,
        )
        np.testing.assert_array_equal(np.asarray(res), np.asarray(stream))
    # stream_gu without stream_down is a usage error.
    with pytest.raises(ValueError, match="stream_gu requires stream_down"):
        fd.fused_decode_codebooks(
            qdec, config, x0, c0_logits, gumbel, 0.8, topk=5, greedy=False,
            interpret=True, stream_gu=True,
        )


def test_streamgu_dispatch_single_program(setup):
    """17..32-row batches route through ONE stream-everything program whose
    rows bitwise equal their solo (resident) runs."""
    config, params, qdec, *_ = setup
    B = fd.MAX_VALIDATED_B_STREAMDOWN + 3
    last_h = jax.random.normal(
        jax.random.key(71), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(72), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(73), B)
    out = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, keys, 0.8, 5, False,
        interpret=True,
    )
    solo = np.stack([
        np.asarray(fd.decode_frame_fused(
            params, qdec, config, last_h[b:b+1], c0_logits[b:b+1],
            keys[b:b+1], 0.8, 5, False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out), solo)


def test_streamdown_dispatch_and_odd_layers(setup):
    """``decode_frame_fused`` routes 9..16-row INT8-HEAD batches through ONE
    streamed program whose rows bitwise equal their solo (resident) runs
    (bf16-head bundles take the validated sequential-chunk path instead —
    the streamed tiers are hardware-validated only at head_bits=8); an odd
    decoder layer count rejects stream_down (the 2-slot refill cycle
    invariant) and the dispatcher falls back to chunking."""
    config, params, _, *_ = setup
    qdec = fd.prepare_fused_decoder(params, config, head_bits=8)
    B = fd.MAX_VALIDATED_B + 2
    last_h = jax.random.normal(
        jax.random.key(51), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(52), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(53), B)
    out = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, keys, 0.8, 5, False,
        interpret=True,
    )
    solo = np.stack([
        np.asarray(fd.decode_frame_fused(
            params, qdec, config, last_h[b:b+1], c0_logits[b:b+1],
            keys[b:b+1], 0.8, 5, False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out), solo)

    import pytest as _pytest

    from csm_tpu.config import CSMConfig

    odd_cfg = CSMConfig.tiny()
    odd_dec = dict(
        hidden_size=odd_cfg.decoder.hidden_size,
        intermediate_size=odd_cfg.decoder.intermediate_size,
        num_hidden_layers=3,
        num_attention_heads=odd_cfg.decoder.num_attention_heads,
        num_key_value_heads=odd_cfg.decoder.num_key_value_heads,
        max_position_embeddings=odd_cfg.decoder.max_position_embeddings,
    )
    from csm_tpu.config import LlamaConfig

    odd_cfg = CSMConfig.tiny(decoder=LlamaConfig(**odd_dec))
    with _pytest.raises(ValueError, match="even decoder layer count"):
        fd.fused_decode_codebooks(
            qdec, odd_cfg, jnp.zeros((2, odd_cfg.decoder.hidden_size)),
            c0_logits[:2], jnp.zeros(
                (odd_cfg.audio_num_codebooks, 2, odd_cfg.audio_vocab_size)
            ),
            1.0, topk=5, greedy=True, interpret=True, stream_down=True,
        )


def test_single_slot_head_schedule_matches_two_slot(setup):
    """Past MAX_VALIDATED_B the kernel switches to a SINGLE-buffered head
    (start-after-consume) — the DMA schedule must not change any draw: a
    direct B=9 program (head_slots=1) must equal per-row the B=1 runs
    (head_slots=2)."""
    config, params, qdec, *_ = setup
    B = fd.MAX_VALIDATED_B + 1
    last_h = jax.random.normal(
        jax.random.key(31), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(32), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    x0 = (last_h @ params["projection"]).astype(jnp.float32)
    N, Va = config.audio_num_codebooks, config.audio_vocab_size
    keys_b = jax.vmap(lambda k: jax.random.split(k, N))(
        jax.random.split(jax.random.key(33), B)
    )
    gumbel = jnp.swapaxes(
        jax.vmap(
            jax.vmap(lambda k: jax.random.gumbel(k, (1, Va), jnp.float32)[0])
        )(keys_b), 0, 1,
    )  # [N, B, Va]
    out = fd.fused_decode_codebooks(
        qdec, config, x0, c0_logits, gumbel, 0.8, topk=5, greedy=False,
        interpret=True,
    )
    solo = np.stack([
        np.asarray(fd.fused_decode_codebooks(
            qdec, config, x0[b:b+1], c0_logits[b:b+1], gumbel[:, b:b+1],
            0.8, topk=5, greedy=False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out), solo)


def test_int8_head_kernel_matches_emulator(setup):
    """``prepare_fused_decoder(head_bits=8)``: the int8-head kernel is
    bit-exact against the emulator's identical W8A16 head math, and the
    quantized head logits stay close to the bf16 head's."""
    config, params, _, last_h, c0_logits = setup
    qdec8 = fd.prepare_fused_decoder(params, config, head_bits=8)
    assert qdec8["audio_head"].dtype == jnp.int8
    assert "head_scale" in qdec8
    N, Va = config.audio_num_codebooks, config.audio_vocab_size
    x0 = (last_h @ params["projection"]).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(42), N)
    for greedy in (True, False):
        gumbel = (
            jnp.zeros((N, 1, Va), jnp.float32)
            if greedy
            else jax.vmap(
                lambda k: jax.random.gumbel(k, (1, Va), jnp.float32)
            )(keys)
        )
        em = fd.emulate_decode_codebooks(
            qdec8, config, x0, c0_logits, gumbel, 0.8, topk=10, greedy=greedy
        )
        kr = fd.fused_decode_codebooks(
            qdec8, config, x0, c0_logits, gumbel, 0.8, topk=10,
            greedy=greedy, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(em), np.asarray(kr))
    # Fidelity: per-channel int8 head reconstructs the bf16 head closely.
    qdec16 = fd.prepare_fused_decoder(params, config)
    recon = qdec8["audio_head"].astype(jnp.float32) * qdec8["head_scale"]
    want = qdec16["audio_head"].astype(jnp.float32)
    denom = float(jnp.abs(want).max())
    assert float(jnp.abs(recon - want).max()) <= denom * 0.02


def test_per_row_sampling_params_match_solo(setup):
    """Per-row temperature/topk vectors and greedy_rows through the fused
    kernel: each batched row is bitwise the solo run with that row's scalar
    parameters; a greedy row equals the greedy=True program's row."""
    config, params, qdec, *_ = setup
    B = 3
    temps = [1.0, 0.7, 1.3]
    topks = [5, 3, 50]
    last_h = jax.random.normal(
        jax.random.key(61), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(62), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(63), B)

    out = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, keys,
        jnp.asarray(temps, jnp.float32), jnp.asarray(topks, jnp.int32),
        False, interpret=True,
    )
    solo = np.stack([
        np.asarray(fd.decode_frame_fused(
            params, qdec, config, last_h[b:b+1], c0_logits[b:b+1],
            keys[b:b+1], temps[b], topks[b], False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out), solo)

    # greedy_rows: row 1 deterministic inside the sampled batch == the
    # greedy program's row (top-1 + zeroed noise ≡ argmax).
    gr = jnp.asarray([False, True, False])
    out_g = fd.decode_frame_fused(
        params, qdec, config, last_h, c0_logits, keys,
        jnp.asarray(temps, jnp.float32), jnp.asarray(topks, jnp.int32),
        False, interpret=True, greedy_rows=gr,
    )
    want_greedy = np.asarray(fd.decode_frame_fused(
        params, qdec, config, last_h[1:2], c0_logits[1:2], keys[1:2],
        1.0, 50, True, interpret=True,
    ))[0]
    np.testing.assert_array_equal(np.asarray(out_g)[1], want_greedy)
    # Non-greedy rows are untouched by the mask.
    np.testing.assert_array_equal(np.asarray(out_g)[0], solo[0])
    np.testing.assert_array_equal(np.asarray(out_g)[2], solo[2])


def test_int8_head_raises_single_program_cap(setup):
    """With the int8 head the wrapper runs one program up to
    MAX_VALIDATED_B_1SLOT and chunks by it past that — rows bitwise equal
    their solo runs either way."""
    config, params, *_ = setup
    qdec8 = fd.prepare_fused_decoder(params, config, head_bits=8)
    B = fd.MAX_VALIDATED_B_1SLOT + 2  # one full chunk + 2-row remainder
    last_h = jax.random.normal(
        jax.random.key(51), (B, config.backbone.hidden_size), jnp.float32
    )
    c0_logits = jax.random.normal(
        jax.random.key(52), (B, config.audio_vocab_size), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    keys = jax.random.split(jax.random.key(53), B)
    out = fd.decode_frame_fused(
        params, qdec8, config, last_h, c0_logits, keys, 0.8, 5, False,
        interpret=True,
    )
    assert out.shape == (B, config.audio_num_codebooks)
    solo = np.stack([
        np.asarray(fd.decode_frame_fused(
            params, qdec8, config, last_h[b:b+1], c0_logits[b:b+1],
            keys[b:b+1], 0.8, 5, False, interpret=True,
        ))[0]
        for b in range(B)
    ])
    np.testing.assert_array_equal(np.asarray(out), solo)

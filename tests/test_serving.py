"""Serving streamer: frame parity with the compiled path + streaming audio."""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig

from tests.oracle import random_csm_batch


@pytest.fixture(scope="module")
def model():
    import jax

    from csm_tpu.models import csm

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(3), cfg)
    return cfg, params


@pytest.mark.slow
def test_streamer_matches_compiled_path(model):
    import jax

    from csm_tpu import generation
    from csm_tpu.serving import CSMStreamer

    cfg, params = model
    data = random_csm_batch(cfg, 2, 9, seed=31)

    ref = generation.generate(
        params, cfg, data["input_ids"], data["attention_mask"],
        max_new_frames=5, temperature=0.9, topk=5,
        rng=jax.random.key(11), stop_on_all_zeros=False, stop_mode="stream",
    )

    streamer = CSMStreamer(params, cfg, temperature=0.9, topk=5,
                           stop_on_all_zeros=False)
    frames = []
    for out in streamer.run(
        data["input_ids"], data["attention_mask"], max_new_frames=5,
        rng=jax.random.key(11),
    ):
        assert out["audio"] is None  # no codec attached
        frames.append(out["frame"])
    got = np.stack(frames, axis=1)

    np.testing.assert_array_equal(got, ref)


def test_streamer_emits_audio_chunks(model):
    """With a codec attached, every frame yields a PCM chunk whose
    concatenation equals the batch decode of the emitted codes."""
    import torch
    from transformers import MimiConfig, MimiModel

    from csm_tpu.codec import MimiCodec, MimiCodecConfig, mimi_params_from_state_dict
    from csm_tpu.serving import CSMStreamer

    cfg, params = model

    ccfg = MimiCodecConfig.tiny(num_quantizers=32)
    hf_cfg = MimiConfig(
        num_quantizers=32, codebook_size=ccfg.codebook_size,
        codebook_dim=ccfg.codebook_dim, hidden_size=ccfg.hidden_size,
        num_filters=ccfg.num_filters,
        vector_quantization_hidden_dimension=ccfg.vector_quantization_hidden_dimension,
        upsample_groups=ccfg.upsample_groups, num_hidden_layers=ccfg.num_hidden_layers,
        intermediate_size=ccfg.intermediate_size,
        num_attention_heads=ccfg.num_attention_heads,
        num_key_value_heads=ccfg.num_key_value_heads, head_dim=ccfg.head_dim,
        sliding_window=ccfg.sliding_window,
        num_semantic_quantizers=ccfg.num_semantic_quantizers,
        num_residual_layers=ccfg.num_residual_layers, attn_implementation="eager",
    )
    torch.manual_seed(5)
    m = MimiModel(hf_cfg).float().eval()
    sd = m.state_dict()
    gen = torch.Generator().manual_seed(6)
    for k in list(sd.keys()):
        if k.endswith("embed_sum"):
            sd[k] = torch.randn(sd[k].shape, generator=gen)
    m.load_state_dict(sd)
    codec = MimiCodec(ccfg, mimi_params_from_state_dict(m.state_dict(), ccfg))

    import jax

    data = random_csm_batch(cfg, 1, 8, seed=32)
    streamer = CSMStreamer(params, cfg, codec=codec, greedy=True,
                           stop_on_all_zeros=False)
    frames, chunks = [], []
    for out in streamer.run(
        data["input_ids"], data["attention_mask"], max_new_frames=4,
        rng=jax.random.key(0),
    ):
        frames.append(out["frame"])
        chunks.append(out["audio"])
        hop = int(2 * ccfg.total_stride)
        assert out["audio"].shape == (1, hop)

    codes = np.stack(frames, axis=2)[0]  # [32, F]
    full = codec.decode(codes)
    streamed = np.concatenate([c[0] for c in chunks])
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Continuous batching (CSMServer)
# ---------------------------------------------------------------------------


def _prompt(cfg, S, seed):
    rng = np.random.default_rng(seed)
    ids = np.zeros((1, S, cfg.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, cfg.text_vocab_size, (1, S))
    mask = np.zeros((1, S, cfg.frame_width), np.float32)
    mask[..., -1] = 1.0
    return ids, mask


def _solo(params, cfg, ids, mask, key, budget, greedy):
    """Reference solo run with per-stream RNG (the server's key schedule)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.generation import generate_compiled

    frames, n = generate_compiled(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        jnp.int32(ids.shape[1]), key[None],
        max_new_frames=budget, temperature=0.9, topk=5, greedy=greedy,
        stop_on_all_zeros=True, stop_mode="stream", cache_len=64,
    )
    return np.asarray(frames)[0, : int(np.asarray(n)[0])]


@pytest.mark.slow
@pytest.mark.parametrize("greedy", [True, False])
def test_continuous_batching_matches_solo(greedy):
    """Stream B joins mid-flight of stream A; both match their solo runs
    token-for-token (greedy AND sampled — per-stream RNG keying)."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 5

    server = CSMServer(
        params, cfg, n_slots=3, window=64,
        temperature=0.9, topk=5, greedy=greedy, max_new_frames=budget,
    )
    ids_a, mask_a = _prompt(cfg, 6, seed=1)
    ids_b, mask_b = _prompt(cfg, 9, seed=2)
    key_a, key_b = jax.random.key(11), jax.random.key(22)

    rid_a = server.submit(ids_a, mask_a, rng=key_a)
    server.step()
    server.step()  # A is 3 frames deep...
    rid_b = server.submit(ids_b, mask_b, rng=key_b)  # ...when B joins
    server.run_until_idle()

    solo_a = _solo(params, cfg, ids_a, mask_a, key_a, budget, greedy)
    solo_b = _solo(params, cfg, ids_b, mask_b, key_b, budget, greedy)
    np.testing.assert_array_equal(server.results[rid_a], solo_a)
    np.testing.assert_array_equal(server.results[rid_b], solo_b)


@pytest.mark.slow
def test_continuous_batching_queues_when_full():
    """More requests than slots: the overflow request waits, is admitted
    into the freed slot, and still matches its solo output."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 3

    server = CSMServer(params, cfg, n_slots=2, window=64, greedy=True,
                       max_new_frames=budget)
    keys = [jax.random.key(100 + i) for i in range(3)]
    prompts = [_prompt(cfg, 4 + 3 * i, seed=10 + i) for i in range(3)]
    rids = [server.submit(p[0], p[1], rng=k) for p, k in zip(prompts, keys)]
    assert len(server.active_slots) == 2  # third is queued
    server.run_until_idle()

    for rid, (ids, mask), key in zip(rids, prompts, keys):
        solo = _solo(params, cfg, ids, mask, key, budget, True)
        np.testing.assert_array_equal(server.results[rid], solo)


@pytest.mark.slow
def test_per_request_sampling_params():
    """Per-request temperature / topk / greedy (dynamic per-row vectors):
    three concurrent requests with DIFFERENT parameters each match the solo
    run with those parameters token-for-token — including a greedy request
    inside a sampled batch (top-1 + zeroed noise ≡ argmax)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.generation import generate_compiled
    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 5

    server = CSMServer(
        params, cfg, n_slots=3, window=64,
        temperature=0.9, topk=5, greedy=False, max_new_frames=budget,
    )
    reqs = [
        # (seed, prompt_len, temperature, topk, greedy)
        (1, 6, None, None, False),   # server defaults (0.9 / 5)
        (2, 9, 1.3, 3, False),       # its own temp + topk
        (3, 7, None, None, True),    # deterministic inside a sampled batch
    ]
    keys = [jax.random.key(40 + i) for i in range(len(reqs))]
    rids = []
    for (seed, S, t, k, g), key in zip(reqs, keys):
        ids, mask = _prompt(cfg, S, seed=seed)
        rids.append(server.submit(ids, mask, rng=key, temperature=t,
                                  topk=k, greedy=g))
    server.run_until_idle()

    for (seed, S, t, k, g), key, rid in zip(reqs, keys, rids):
        ids, mask = _prompt(cfg, S, seed=seed)
        frames, n = generate_compiled(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            jnp.int32(S), key[None],
            max_new_frames=budget,
            temperature=0.9 if t is None else t,
            topk=5 if k is None else k, greedy=g,
            stop_on_all_zeros=True, stop_mode="stream", cache_len=64,
        )
        solo = np.asarray(frames)[0, : int(np.asarray(n)[0])]
        np.testing.assert_array_equal(server.results[rid], solo)


@pytest.mark.slow
@pytest.mark.parametrize("greedy", [True, False])
def test_prefix_caching_matches_full_prompt(greedy):
    """register_prefix + submit(prefix_id=): the continuation prefills
    against the cached prefix K/V and the token stream equals submitting
    ``[prefix; continuation]`` as one prompt (the cached path always
    attends over the full static window, so the math is identical).  Two
    requests share one prefix; a no-prefix request runs alongside."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 4

    server = CSMServer(
        params, cfg, n_slots=3, window=64,
        temperature=0.9, topk=5, greedy=greedy, max_new_frames=budget,
    )
    pre_ids, pre_mask = _prompt(cfg, 6, seed=71)
    pid = server.register_prefix(pre_ids, pre_mask)

    conts = [_prompt(cfg, 3, seed=72), _prompt(cfg, 5, seed=73)]
    keys = [jax.random.key(81), jax.random.key(82), jax.random.key(83)]
    rid_a = server.submit(conts[0][0], conts[0][1], rng=keys[0], prefix_id=pid)
    rid_b = server.submit(conts[1][0], conts[1][1], rng=keys[1], prefix_id=pid)
    ids_c, mask_c = _prompt(cfg, 4, seed=74)
    rid_c = server.submit(ids_c, mask_c, rng=keys[2])  # no prefix
    server.run_until_idle()

    for rid, (c_ids, c_mask), key in zip((rid_a, rid_b), conts, keys):
        full_ids = np.concatenate([pre_ids, c_ids], axis=1)
        full_mask = np.concatenate([pre_mask, c_mask], axis=1)
        solo = _solo(params, cfg, full_ids, full_mask, key, budget, greedy)
        np.testing.assert_array_equal(server.results[rid], solo)
    solo_c = _solo(params, cfg, ids_c, mask_c, keys[2], budget, greedy)
    np.testing.assert_array_equal(server.results[rid_c], solo_c)

    # The prefix is reusable after serving (not donated) and droppable.
    rid_d = server.submit(conts[0][0], conts[0][1], rng=keys[0], prefix_id=pid)
    server.run_until_idle()
    np.testing.assert_array_equal(
        server.results[rid_d], server.results[rid_a]
    )

    # Stacked prefix (context tree): child = parent + extension; a request
    # on the child equals the fully concatenated prompt.
    ext_ids, ext_mask = _prompt(cfg, 4, seed=75)
    child = server.register_prefix(ext_ids, ext_mask, prefix_id=pid)
    tail_ids, tail_mask = _prompt(cfg, 3, seed=76)
    rid_e = server.submit(tail_ids, tail_mask, rng=keys[2], prefix_id=child)
    server.run_until_idle()
    full_ids = np.concatenate([pre_ids, ext_ids, tail_ids], axis=1)
    full_mask = np.concatenate([pre_mask, ext_mask, tail_mask], axis=1)
    solo_e = _solo(params, cfg, full_ids, full_mask, keys[2], budget, greedy)
    np.testing.assert_array_equal(server.results[rid_e], solo_e)
    server.drop_prefix(child)
    server.drop_prefix(pid)


@pytest.mark.slow
def test_streamer_prefix_matches_full_prompt(model):
    """CSMStreamer.register_prefix + start(prefix_id=): the session's
    frames equal a full-prompt session with the same key."""
    import jax

    from csm_tpu.serving import CSMStreamer

    cfg, params = model
    pre_ids, pre_mask = _prompt(cfg, 6, seed=201)
    c_ids, c_mask = _prompt(cfg, 3, seed=202)

    def frames_of(streamer, ids, mask, **kw):
        out = [streamer.start(ids, mask, rng=jax.random.key(7),
                              max_new_frames=8, **kw)]
        for _ in range(3):
            out.append(streamer.step())
        return np.stack(out)

    s1 = CSMStreamer(params, cfg, temperature=0.9, topk=5,
                     stop_on_all_zeros=False)
    pid = s1.register_prefix(pre_ids, pre_mask, max_new_frames=16)
    got = frames_of(s1, c_ids, c_mask, prefix_id=pid)

    s2 = CSMStreamer(params, cfg, temperature=0.9, topk=5,
                     stop_on_all_zeros=False)
    full_ids = np.concatenate([pre_ids, c_ids], axis=1)
    full_mask = np.concatenate([pre_mask, c_mask], axis=1)
    want = frames_of(s2, full_ids, full_mask)
    np.testing.assert_array_equal(got, want)
    s1.drop_prefix(pid)


@pytest.mark.slow
def test_greedy_server_ignores_per_request_overrides():
    """A server built with greedy=True is deterministic for every request;
    per-request sampling overrides are documented as ignored — outputs
    still equal the greedy solo run."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 3
    server = CSMServer(params, cfg, n_slots=2, window=64, greedy=True,
                       max_new_frames=budget)
    ids, mask = _prompt(cfg, 5, seed=61)
    key = jax.random.key(62)
    rid = server.submit(ids, mask, rng=key, temperature=0.3, topk=2)
    server.run_until_idle()
    solo = _solo(params, cfg, ids, mask, key, budget, True)
    np.testing.assert_array_equal(server.results[rid], solo)


@pytest.mark.slow
def test_server_streaming_audio_matches_offline_decode():
    """CSMServer(codec=...): every slot's chunked PCM equals the offline
    decode of its result frames — including a request admitted into a
    REUSED slot (the per-slot streaming decoder state must reset at
    admission or the previous occupant's conv/KV state leaks into the new
    stream's audio)."""
    import jax

    from csm_tpu.codec import MimiCodec, MimiCodecConfig, random_mimi_params
    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    ccfg = MimiCodecConfig.tiny(num_quantizers=cfg.audio_num_codebooks)
    codec = MimiCodec(ccfg, random_mimi_params(ccfg, seed=7))

    budget = 4
    server = CSMServer(params, cfg, n_slots=2, window=64, greedy=True,
                       stop_on_all_zeros=False, max_new_frames=budget,
                       codec=codec)
    rids = []
    for i, S in enumerate((5, 7, 6)):  # 3 requests, 2 slots: one queued
        ids, mask = _prompt(cfg, S, seed=80 + i)
        rids.append(server.submit(ids, mask, rng=jax.random.key(90 + i)))
    server.run_until_idle()

    hop = int(2 * ccfg.total_stride)
    for rid in rids:
        frames = server.results[rid]  # [F, 32]
        assert frames.shape[0] == budget
        offline = codec.decode(frames.T.astype(np.int32))  # [samples]
        got = server.audio[rid]
        assert got.shape == (budget * hop,)
        np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-5)
    assert server.stats()["audio_samples"] == 3 * budget * hop


def test_cancel_with_codec_finalizes_partial_audio():
    """Cancelling a running request with a codec attached finalizes its
    PCM: server.audio[rid] holds exactly the frames observed so far,
    and the freed slot's decoder resets cleanly for the next request."""
    import jax

    from csm_tpu.codec import MimiCodec, MimiCodecConfig, random_mimi_params
    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    ccfg = MimiCodecConfig.tiny(num_quantizers=cfg.audio_num_codebooks)
    codec = MimiCodec(ccfg, random_mimi_params(ccfg, seed=9))
    hop = int(2 * ccfg.total_stride)

    server = CSMServer(params, cfg, n_slots=1, window=64, greedy=True,
                       stop_on_all_zeros=False, max_new_frames=6,
                       codec=codec)
    ids, mask = _prompt(cfg, 5, seed=95)
    rid = server.submit(ids, mask, rng=jax.random.key(96))
    server.step()  # admission frame + one step = 2 frames observed
    server.cancel(rid)
    assert server.results[rid].shape[0] == 2
    assert server.audio[rid].shape == (2 * hop,)
    np.testing.assert_allclose(
        server.audio[rid],
        codec.decode(server.results[rid].T.astype(np.int32)),
        rtol=1e-4, atol=1e-5,
    )
    # The freed slot serves a fresh request with reset decoder state.
    ids2, mask2 = _prompt(cfg, 6, seed=97)
    rid2 = server.submit(ids2, mask2, rng=jax.random.key(98))
    server.run_until_idle()
    np.testing.assert_allclose(
        server.audio[rid2],
        codec.decode(server.results[rid2].T.astype(np.int32)),
        rtol=1e-4, atol=1e-5,
    )


def test_uniform_fast_path_engages_with_inexact_default_temp():
    """Regression: a default temperature that is not exactly representable
    in float32 (e.g. 0.9) must still count as "uniform" when every slot
    runs defaults — the slot vector is float32, so the default must be
    canonicalized through float32 or the comparison is always False and
    the static fast-path programs silently never engage."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    server = CSMServer(params, cfg, n_slots=2, window=64,
                       temperature=0.9, topk=5, max_new_frames=3)
    ids, mask = _prompt(cfg, 5, seed=71)
    server.submit(ids, mask, rng=jax.random.key(72))  # all defaults
    assert server._uniform_active()
    # An explicit override equal to the default is also uniform (same
    # canonicalization at submit).
    server.submit(ids, mask, rng=jax.random.key(73), temperature=0.9)
    assert server._uniform_active()
    server.run_until_idle()


def test_prefix_error_paths():
    """Unknown prefix ids fail fast at submit; a prefix dropped while its
    request sat queued soft-fails that request (empty result + warning)
    without crashing the serving loop; ids are never reused after drop."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    server = CSMServer(params, cfg, n_slots=1, window=64, greedy=True,
                       max_new_frames=2)

    with pytest.raises(KeyError):
        server.submit(*_prompt(cfg, 4, seed=1), prefix_id="nope")

    pid_a = server.register_prefix(*_prompt(cfg, 4, seed=2))
    server.drop_prefix(pid_a)
    pid_b = server.register_prefix(*_prompt(cfg, 4, seed=3))
    assert pid_b != pid_a  # monotonic ids: no silent reuse after drop

    # Fill the single slot, queue a prefix request, then drop its prefix.
    r_busy = server.submit(*_prompt(cfg, 4, seed=4))
    r_q = server.submit(*_prompt(cfg, 3, seed=5), prefix_id=pid_b)
    server.drop_prefix(pid_b)
    with pytest.warns(UserWarning, match="dropped while"):
        server.run_until_idle()
    assert len(server.results[r_q]) == 0  # soft-failed, loop survived
    assert len(server.results[r_busy]) > 0


@pytest.mark.slow
def test_cancel_frees_slot_without_disturbing_others():
    """cancel(): a queued request is dropped, a running one frees its slot
    (admitting the queue), and surviving streams still match their solo
    runs token-for-token."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 5

    server = CSMServer(params, cfg, n_slots=2, window=64,
                       temperature=0.9, topk=5, greedy=False,
                       max_new_frames=budget)
    keys = [jax.random.key(91 + i) for i in range(3)]
    prompts = [_prompt(cfg, 4 + 2 * i, seed=90 + i) for i in range(3)]
    rids = [server.submit(p[0], p[1], rng=k) for p, k in zip(prompts, keys)]
    assert len(server.active_slots) == 2  # rids[2] queued

    server.step()
    assert server.cancel(rids[0])  # running: frees a slot, admits rids[2]
    # partial result: frame 0 from the admission prefill + one step
    assert rids[0] in server.results and len(server.results[rids[0]]) == 2
    assert len(server.active_slots) == 2
    assert not server.cancel(rids[0])  # already finished
    server.run_until_idle()

    for i in (1, 2):
        solo = _solo(params, cfg, prompts[i][0], prompts[i][1], keys[i],
                     budget, False)
        np.testing.assert_array_equal(server.results[rids[i]], solo)

    st = server.stats()
    assert st["active_slots"] == 0 and st["queued"] == 0
    assert st["completed"] == 3 and st["prefills"] == 3
    assert st["frames_emitted"] >= 2 * budget

    # Cancelling a queued request drops it before admission.
    server2 = CSMServer(params, cfg, n_slots=1, window=64, greedy=True,
                        max_new_frames=budget)
    r1 = server2.submit(prompts[0][0], prompts[0][1], rng=keys[0])
    r2 = server2.submit(prompts[1][0], prompts[1][1], rng=keys[1])
    assert server2.cancel(r2)
    server2.run_until_idle()
    assert len(server2.results[r2]) == 0 and len(server2.results[r1]) > 0


@pytest.mark.slow
def test_step_many_chunked_matches_single_steps():
    """run_until_idle(chunk=4) (device-side multi-step scan) produces the
    same results as per-frame stepping, including mid-flight admission at
    chunk boundaries."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    budget = 6

    def run(chunk):
        server = CSMServer(params, cfg, n_slots=2, window=64,
                           temperature=0.9, topk=5, greedy=False,
                           max_new_frames=budget)
        keys = [jax.random.key(31), jax.random.key(32), jax.random.key(33)]
        prompts = [_prompt(cfg, 5 + 2 * i, seed=50 + i) for i in range(3)]
        rids = [server.submit(p[0], p[1], rng=k) for p, k in zip(prompts, keys)]
        server.run_until_idle(chunk=chunk)
        return {rid: server.results[rid] for rid in rids}

    a = run(1)
    b = run(4)
    assert a.keys() == b.keys()
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid])


@pytest.mark.slow
def test_streamer_quantized_path(model):
    """CSMStreamer accepts the same qdec/qbb/qsb fast paths as CSMServer
    (VERDICT r2 weak #3): the per-frame steps run through the streamed
    backbone + fused decoder kernels (interpret mode on CPU), frames are in
    range, and runs are deterministic."""
    import jax

    from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder
    from csm_tpu.serving import CSMStreamer

    cfg, params = model
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, cfg))(params)
    qsb = jax.jit(lambda p: prepare_streamed_backbone(p, cfg))(params)
    data = random_csm_batch(cfg, 1, 8, seed=41)

    def run():
        streamer = CSMStreamer(params, cfg, greedy=True,
                               stop_on_all_zeros=False, qdec=qdec, qsb=qsb)
        frames = [
            out["frame"] for out in streamer.run(
                data["input_ids"], data["attention_mask"], max_new_frames=4,
                rng=jax.random.key(13),
            )
        ]
        return np.stack(frames, axis=1)

    a = run()
    b = run()
    assert a.shape == (1, 4, cfg.audio_num_codebooks)
    assert (a >= 0).all() and (a < cfg.audio_vocab_size).all()
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_server_with_streamed_backbone_kernel():
    """CSMServer(qsb=...) routes decode steps through the streamed-weight
    backbone kernel (interpret mode on CPU): all requests complete, frames
    are in range, and runs are deterministic."""
    import jax

    from csm_tpu.models import csm
    from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
    from csm_tpu.serving import CSMServer

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    qsb = jax.jit(lambda p: prepare_streamed_backbone(p, cfg))(params)
    budget = 3

    def run():
        server = CSMServer(params, cfg, n_slots=2, window=64, greedy=True,
                           max_new_frames=budget, qsb=qsb)
        keys = [jax.random.key(7), jax.random.key(8)]
        prompts = [_prompt(cfg, 4 + 2 * i, seed=60 + i) for i in range(2)]
        rids = [server.submit(p[0], p[1], rng=k) for p, k in zip(prompts, keys)]
        server.run_until_idle()
        return [server.results[r] for r in rids]

    a = run()
    b = run()
    for fa, fb in zip(a, b):
        assert fa.shape[-1] == cfg.audio_num_codebooks
        assert (fa >= 0).all() and (fa < cfg.audio_vocab_size).all()
        np.testing.assert_array_equal(fa, fb)

"""Focused unit tests: llama3 RoPE scaling vs HF, config JSON round-trip,
top-k sampler semantics."""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig, LlamaConfig, RopeScalingConfig


def test_llama3_rope_scaling_matches_hf():
    """inv_freq with llama3 scaling matches HF's _compute_llama3_parameters
    for the real backbone shape (64-dim heads, theta 5e5, factor 32)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from csm_tpu.ops.rope import compute_inv_freq

    cfg = LlamaConfig()  # backbone shape
    hf = HFLlamaConfig(
        hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        rope_theta=cfg.rope_theta,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    )
    inv_hf, scale = ROPE_INIT_FUNCTIONS["llama3"](hf, "cpu")
    assert scale == 1.0
    np.testing.assert_allclose(
        compute_inv_freq(cfg), inv_hf.numpy(), rtol=1e-6, atol=1e-12
    )


def test_rope_scaling_band_structure():
    """High-freq components untouched, low-freq divided by factor."""
    from csm_tpu.ops.rope import compute_inv_freq

    cfg = LlamaConfig()
    scaled = compute_inv_freq(cfg)
    unscaled = compute_inv_freq(
        LlamaConfig(rope_scaling=None)
    )
    wavelen = 2 * np.pi / unscaled
    high = wavelen < 8192 / 4.0
    low = wavelen > 8192 / 1.0
    np.testing.assert_allclose(scaled[high], unscaled[high], rtol=1e-7)
    np.testing.assert_allclose(scaled[low], unscaled[low] / 32.0, rtol=1e-6)


def test_config_json_roundtrip(tmp_path):
    cfg = CSMConfig.tiny()
    path = str(tmp_path / "config.json")
    cfg.to_json(path)
    loaded = CSMConfig.from_json(path)
    assert loaded == cfg
    # string form too
    assert CSMConfig.from_json(cfg.to_json()) == cfg


def test_config_forced_overrides():
    """Reference constructor overrides (``modeling_csm.py:128-141``)."""
    cfg = CSMConfig(
        max_seq_len=123,
        text_vocab_size=77,
        backbone=LlamaConfig(max_position_embeddings=999, vocab_size=5),
        decoder=LlamaConfig(max_position_embeddings=999, vocab_size=5),
    )
    assert cfg.backbone.max_position_embeddings == 123
    assert cfg.decoder.max_position_embeddings == cfg.audio_num_codebooks
    assert cfg.backbone.vocab_size == 77 and cfg.decoder.vocab_size == 77
    assert cfg.decoder_rope_positions == 33


def test_config_from_reference_dict():
    """Accepts the reference's serialized config layout (backbone_config /
    decoder_config keys with HF LlamaConfig fields)."""
    d = {
        "model_type": "csm",
        "text_vocab_size": 128256,
        "audio_vocab_size": 2051,
        "audio_num_codebooks": 32,
        "max_seq_len": 2048,
        "backbone_config": {
            "hidden_size": 2048, "intermediate_size": 8192,
            "num_hidden_layers": 16, "num_attention_heads": 32,
            "num_key_value_heads": 8, "rms_norm_eps": 1e-5,
            "rope_theta": 500000.0,
            "rope_scaling": {"type": "llama3", "factor": 32.0,
                             "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                             "original_max_position_embeddings": 8192},
        },
        "decoder_config": {
            "hidden_size": 1024, "intermediate_size": 8192,
            "num_hidden_layers": 4, "num_attention_heads": 8,
            "num_key_value_heads": 2, "rope_theta": 500000.0,
            "rope_scaling": {"type": "llama3", "factor": 32.0,
                             "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                             "original_max_position_embeddings": 8192},
        },
    }
    cfg = CSMConfig.from_dict(d)
    assert cfg.backbone.num_hidden_layers == 16
    assert cfg.decoder.num_key_value_heads == 2
    assert cfg.backbone.rope_scaling.rope_type == "llama3"
    assert cfg == CSMConfig()  # the reference defaults ARE CSM-1B


def test_sample_topk_restricts_support():
    """Samples only ever come from the top-k set; ties at the k-th value are
    kept (reference filter semantics, ``modeling_csm.py:183-185``)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.sampling import sample_topk, topk_mask

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((4, 50)), jnp.float32)
    top5 = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
    for i in range(20):
        s = np.asarray(sample_topk(jax.random.key(i), logits, 5, 0.7))
        for b in range(4):
            assert s[b] in top5[b]

    # tie handling: duplicate k-th value stays unmasked
    row = jnp.asarray([[1.0, 3.0, 3.0, 0.0]])
    masked = np.asarray(topk_mask(row, 2))
    assert (masked[0, 1:3] == 3.0).all() and masked[0, 0] < -1e8


def test_per_row_topk_and_batch_sampler():
    """Per-row dynamic parameters: the traced-k sort path of topk_mask
    matches the static lax.top_k path row-for-row (incl. k=1, k=V, ties),
    and sample_topk_batch with per-row (k, temp) vectors is bitwise each
    row's solo static-parameter draw; greedy_rows rows equal argmax."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.sampling import sample_topk, sample_topk_batch, topk_mask

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal((4, 50)), jnp.float32)
    # duplicate a k-th value to cover tie handling in the dynamic path
    logits = logits.at[2, 10].set(logits[2, 11])
    ks = [1, 3, 50, 7]
    dyn = np.asarray(
        jax.jit(topk_mask)(logits, jnp.asarray(ks, jnp.int32))
    )
    for b, k in enumerate(ks):
        stat = np.asarray(topk_mask(logits[b : b + 1], k))[0]
        np.testing.assert_array_equal(dyn[b], stat)

    keys = jax.random.split(jax.random.key(3), 4)
    temps = [0.7, 1.0, 1.4, 0.9]
    batched = np.asarray(sample_topk_batch(
        keys, logits, jnp.asarray(ks, jnp.int32),
        jnp.asarray(temps, jnp.float32),
    ))
    for b in range(4):
        solo = np.asarray(
            sample_topk(keys[b], logits[b : b + 1], ks[b], temps[b])
        )[0]
        assert batched[b] == solo

    gr = jnp.asarray([False, True, False, True])
    mixed = np.asarray(sample_topk_batch(
        keys, logits, jnp.asarray(ks, jnp.int32),
        jnp.asarray(temps, jnp.float32), greedy_rows=gr,
    ))
    want = np.asarray(jnp.argmax(logits, axis=-1))
    assert mixed[1] == want[1] and mixed[3] == want[3]
    assert mixed[0] == batched[0] and mixed[2] == batched[2]


def test_sample_topk_distribution():
    """Empirical frequencies match the top-k softmax distribution."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.ops.sampling import sample_topk

    logits = jnp.asarray([[2.0, 1.0, 0.0, -50.0]], jnp.float32)
    draws = np.asarray(
        jax.vmap(lambda k: sample_topk(k, logits, 3, 1.0))(
            jax.random.split(jax.random.key(0), 4000)
        )
    ).ravel()
    probs = np.exp([2.0, 1.0, 0.0])
    probs = probs / probs.sum()
    freq = np.bincount(draws, minlength=4) / len(draws)
    assert freq[3] == 0.0
    np.testing.assert_allclose(freq[:3], probs, atol=0.03)


def test_sample_topk_statistical_parity_vs_torch():
    """Distributional parity with the reference sampler (VERDICT r2 next #8):
    on fixed tiny-vocab logits, the empirical distributions of our Gumbel
    top-k draws and the reference's ``sample_topk``
    (``modeling_csm.py:170-189``) agree to small total-variation distance —
    and both match the exact temperature-scaled top-k softmax."""
    import jax
    import torch

    from csm_tpu.ops.sampling import sample_topk

    from tests.oracle import _import_reference

    modeling_csm = _import_reference()

    V, topk, temp, n = 16, 5, 0.8, 100_000
    rng = np.random.default_rng(3)
    row = rng.standard_normal(V).astype(np.float32)

    # exact top-k softmax after temperature scaling
    scaled = row / temp
    kth = np.sort(scaled)[-topk]
    exact = np.where(scaled < kth, -np.inf, scaled)
    exact = np.exp(exact - exact.max())
    exact = exact / exact.sum()

    # ours: n independent per-key draws of the same row
    import jax.numpy as jnp

    jrow = jnp.asarray(row)[None, :]
    ours = np.asarray(
        jax.jit(
            jax.vmap(lambda k: sample_topk(k, jrow, topk, temp)[0])
        )(jax.random.split(jax.random.key(0), n))
    )
    ours_freq = np.bincount(ours, minlength=V) / n

    # reference: one batched call on n copies of the row
    torch.manual_seed(0)
    tlogits = torch.from_numpy(np.tile(row, (n, 1)))
    ref = modeling_csm.sample_topk(tlogits, topk, temp).numpy().ravel()
    ref_freq = np.bincount(ref, minlength=V) / n

    def tv(p, q):
        return 0.5 * np.abs(p - q).sum()

    assert tv(ours_freq, exact) < 0.01
    assert tv(ref_freq, exact) < 0.01
    assert tv(ours_freq, ref_freq) < 0.015
    # support is identical: both sample only the top-k set
    assert set(np.nonzero(ours_freq)[0]) == set(np.nonzero(exact)[0])
    assert set(np.nonzero(ref_freq)[0]) == set(np.nonzero(exact)[0])


def test_warmup_generation_compiles():
    """warmup_generation AOT-compiles without executing (tiny config, CPU)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.utils.warmup import warmup_generation

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    n = warmup_generation(
        params, cfg, batch_sizes=(1,), prompt_buckets=(8,), frame_budgets=(2,),
    )
    assert n == 1


def test_parse_args_mesh_flags():
    """The argparse surface auto-generated from the dataclasses exposes the
    mesh axes (reference CLI + our parallelism flags, SURVEY §2a#14)."""
    from csm_tpu.train.args import parse_args

    _, _, targs = parse_args([
        "--train_file", "x.jsonl", "--output_dir", "/tmp/o",
        "--mesh_data", "2", "--mesh_seq", "2", "--mesh_model", "2",
        "--learning_rate", "1e-4",
    ])
    assert (targs.mesh_data, targs.mesh_seq, targs.mesh_model) == (2, 2, 2)
    assert targs.learning_rate == 1e-4


def test_no_convert_pair_rounding_outside_kernels():
    """Guard against reintroducing the excess-precision hazard: on this
    TPU backend ``--xla_allow_excess_precision`` lets XLA elide an
    ``astype(bf16).astype(f32)`` convert pair in one consumer but not
    another, making "rounded" logits compare unequal to themselves
    (hardware-observed as first_argmax's 2**30 sentinel).  XLA-side code
    must use ``ops.fused_decoder.bf16_round`` (lax.reduce_precision);
    only Pallas kernel bodies may keep the literal convert spelling."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "csm_tpu"
    pat = re.compile(r"astype\(jnp\.bfloat16\)\s*\.astype\(jnp\.float32\)")
    allowed = {
        # In-kernel sites (Mosaic compiles converts literally):
        "ops/fused_decoder.py": 1,  # classify() inside the kernel body
        # the c0-head rounding + the EXACT tier's compiled-mode rnd hook,
        # both inside the kernel body (interpret mode swaps in bf16_round):
        "ops/bb_kernel.py": 2,
    }
    for f in sorted(root.rglob("*.py")):
        rel = str(f.relative_to(root))
        n = len(pat.findall(f.read_text()))
        assert n <= allowed.get(rel, 0), (
            f"{rel}: {n} astype(bf16).astype(f32) convert pair(s) — use "
            "bf16_round (lax.reduce_precision) outside Pallas kernel bodies"
        )


def test_readme_perf_generator_roundtrip(tmp_path):
    """gen_readme_perf builds a table containing every known metric row and
    rewrites exactly the marked README block (idempotent)."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "gen_readme_perf", root / "scripts" / "gen_readme_perf.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    metrics = {
        "csm1b_frames_per_sec_single_stream_exact": {
            "metric": "csm1b_frames_per_sec_single_stream_exact",
            "value": 150.0, "vs_baseline": 19.5, "reps": 5,
        },
        "csm1b_frames_per_sec_single_stream": {
            "metric": "csm1b_frames_per_sec_single_stream",
            "value": 260.0, "vs_baseline": 33.8,
        },
        "csm1b_exact_teacher_forced_token_agreement_pct": {
            "metric": "csm1b_exact_teacher_forced_token_agreement_pct",
            "value": 100.0, "vs_baseline": 1.0,
        },
        "csm1b_frames_per_sec_batch8_aggregate_exact": {
            "metric": "csm1b_frames_per_sec_batch8_aggregate_exact",
            "value": 1200.0, "vs_baseline": 156.0,
        },
    }
    block = mod.build_block(metrics)
    assert "EXACT bf16-parity tier" in block
    assert "**150 frames/s**" in block
    assert "**1200 frames/s** aggregate" in block
    assert "exact_batch8_serving" in block
    assert "EXACT tier 100 %" in block
    assert block.startswith(mod.BEGIN) and block.endswith(mod.END)
    # marker replacement is idempotent
    readme = "head\n" + mod.BEGIN + "\nstale\n" + mod.END + "\ntail\n"
    pre, rest = readme.split(mod.BEGIN, 1)
    _, post = rest.split(mod.END, 1)
    new = pre + block + post
    assert new.startswith("head\n") and new.endswith("\ntail\n")
    assert "stale" not in new

"""CSMModel class API + checkpoint round-trip tests."""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig
from csm_tpu.model_api import CSMModel

from tests.oracle import jax_params_from_torch, random_csm_batch, torch_csm_from_config


def test_forward_and_generate_surface():
    cfg = CSMConfig.tiny()
    model = CSMModel(cfg, seed=0)
    data = random_csm_batch(cfg, 1, 10, seed=0)

    out = model(data["input_ids"], data["attention_mask"], labels=data["labels"])
    assert np.isfinite(float(out.loss))
    assert out.logits.shape == (1, cfg.audio_vocab_size)

    model.setup_caches(max_batch_size=1)  # reference shim
    model.reset_caches()

    frames = model.generate(
        data["input_ids"], data["attention_mask"], max_new_frames=3,
        greedy=True, stop_on_all_zeros=False,
    )
    assert frames.shape == (1, 3, 32)

    f = model.generate_frame(data["input_ids"], data["attention_mask"], greedy=True)
    assert f.samples.shape == (1, 32)
    np.testing.assert_array_equal(np.asarray(f.samples), frames[:, 0])


def test_forward_return_dict_false_and_inert_flags():
    """``return_dict=False`` yields the reference's tuple form
    (``modeling_csm.py:467-473``); ``output_attentions`` /
    ``output_hidden_states`` are accepted and change nothing (the reference
    computes and discards them)."""
    cfg = CSMConfig.tiny()
    model = CSMModel(cfg, seed=0)
    data = random_csm_batch(cfg, 1, 10, seed=0)

    ref = model(data["input_ids"], data["attention_mask"], labels=data["labels"])
    tup = model(
        data["input_ids"], data["attention_mask"], labels=data["labels"],
        return_dict=False, output_attentions=True, output_hidden_states=True,
    )
    assert isinstance(tup, tuple) and len(tup) == 3  # (loss, last_h, logits)
    np.testing.assert_allclose(float(tup[0]), float(ref.loss))
    np.testing.assert_array_equal(np.asarray(tup[1]),
                                  np.asarray(ref.last_hidden_state))
    np.testing.assert_array_equal(np.asarray(tup[2]), np.asarray(ref.logits))

    tup2 = model(data["input_ids"], data["attention_mask"], return_dict=False)
    assert isinstance(tup2, tuple) and len(tup2) == 2  # no labels → no loss


def test_save_load_roundtrip(tmp_path):
    cfg = CSMConfig.tiny()
    model = CSMModel(cfg, seed=1)
    model.save_pretrained(str(tmp_path / "ckpt"))

    loaded = CSMModel.from_pretrained(str(tmp_path / "ckpt"))
    assert loaded.config == cfg

    import jax

    a = jax.tree.leaves(model.params)
    b = jax.tree.leaves(loaded.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_reference_checkpoint_interop(tmp_path):
    """A torch-reference state dict → JAX → safetensors → torch again is
    lossless; and the reference model loads our saved file's tensors."""
    import torch

    cfg = CSMConfig.tiny()
    t_model = torch_csm_from_config(cfg, seed=2)
    params = jax_params_from_torch(t_model, cfg)

    model = CSMModel(cfg, params)
    model.save_pretrained(str(tmp_path / "export"))

    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "export" / "model.safetensors"))
    ref_sd = t_model.state_dict()
    assert set(sd.keys()) == set(ref_sd.keys())
    for k in ref_sd:
        np.testing.assert_allclose(
            sd[k], ref_sd[k].numpy(), rtol=1e-6, atol=1e-7, err_msg=k
        )
    # the torch reference accepts the round-tripped tensors
    t_model.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})


def test_forward_label_free_hits_jit_cache():
    """Repeated label-free forward() calls reuse ONE compiled program
    (round 1 rebuilt jax.jit per call — a recompile every call)."""
    import jax
    import numpy as np
    from csm_tpu.config import CSMConfig
    from csm_tpu.model_api import CSMModel

    model = CSMModel(CSMConfig.tiny())
    ids = np.zeros((1, 4, 33), np.int32)
    mask = np.ones((1, 4, 33), np.float32)
    with jax.log_compiles(False):
        model.forward(ids, mask)
        model.forward(ids, mask)
        model.forward(ids, mask)
    assert model._fwd_nolabels._cache_size() == 1


@pytest.mark.slow
def test_quantized_generate_surface():
    """model.quantize() enables the int8 fast paths through the class API
    (interpret mode on CPU): generation runs, stays deterministic, and
    emits in-range frames."""
    import jax

    from csm_tpu.config import CSMConfig
    from csm_tpu.model_api import CSMModel

    cfg = CSMConfig.tiny()
    model = CSMModel(cfg, seed=0).quantize()
    rng = np.random.default_rng(4)
    ids = np.zeros((1, 6, cfg.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, cfg.text_vocab_size, (1, 6))
    mask = np.zeros((1, 6, cfg.frame_width), np.float32)
    mask[..., -1] = 1.0

    out = [
        model.generate(ids, mask, max_new_frames=2, greedy=True,
                       stop_on_all_zeros=False, rng=jax.random.key(1))
        for _ in range(2)
    ]
    assert out[0].shape == (1, 2, cfg.audio_num_codebooks)
    assert out[0].min() >= 0 and out[0].max() < cfg.audio_vocab_size
    np.testing.assert_array_equal(out[0], out[1])

    # head_bits=8 (int8 audio_head tier) flows through the same surface.
    model8 = CSMModel(cfg, seed=0).quantize(head_bits=8)
    assert "head_scale" in model8._qdec
    out8 = model8.generate(ids, mask, max_new_frames=2, greedy=True,
                           stop_on_all_zeros=False, rng=jax.random.key(1))
    assert out8.shape == (1, 2, cfg.audio_num_codebooks)
    assert out8.min() >= 0 and out8.max() < cfg.audio_vocab_size

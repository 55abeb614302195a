"""Committed golden fixtures: the full checkpoint-load path vs frozen
reference outputs, with NO torch / reference dependency at test time.

``tests/fixtures/tiny_golden/`` holds a tiny random-weight checkpoint in the
published ``thomasgauthier/csm-1b-hf`` key layout plus the torch reference's
outputs on it (generated once by ``scripts/make_golden_fixtures.py``).  These
tests drive ``CSMModel.from_pretrained`` → ``hf_convert`` → forward/generate
exactly the way a user loading the real 1B checkpoint would — a key-mapping
regression in the converter fails here even offline.  The full-scale
equivalent (real hub weights) is ``scripts/fetch_and_verify.py``.
"""

import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_golden")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(os.path.join(FIXDIR, "model.safetensors")):
        pytest.skip("golden fixtures not generated")
    from csm_tpu.model_api import CSMModel

    model = CSMModel.from_pretrained(FIXDIR)
    data = np.load(os.path.join(FIXDIR, "golden.npz"))
    return model, data


def test_forward_matches_reference_fixture(golden):
    model, data = golden
    out = model.forward(
        data["input_ids"], data["attention_mask"].astype(np.float32),
        labels=data["labels"],
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), data["c0_logits_last"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(float(out.loss), float(data["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(out.backbone_loss), float(data["backbone_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(out.decoder_loss), float(data["decoder_loss"]), rtol=2e-4
    )


def test_generate_matches_reference_fixture(golden):
    """Greedy multi-frame generation is token-exact against the frozen
    reference run (reference used topk=1; we use greedy=True)."""
    model, data = golden
    frames = model.generate(
        data["input_ids"], data["attention_mask"].astype(np.float32),
        max_new_frames=int(data["greedy_frames"].shape[1]),
        stop_on_all_zeros=False, greedy=True,
    )
    np.testing.assert_array_equal(np.asarray(frames), data["greedy_frames"])


def test_fixture_roundtrip_through_save_pretrained(golden, tmp_path):
    """save_pretrained → from_pretrained round-trips bit-exactly, so
    checkpoints written here load in the torch reference unchanged."""
    model, data = golden
    model.save_pretrained(str(tmp_path))
    from csm_tpu.model_api import CSMModel

    model2 = CSMModel.from_pretrained(str(tmp_path))
    import jax

    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

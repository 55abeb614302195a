"""Forward-pass and loss parity vs the torch reference (SURVEY §4.1).

Identical tiny-config random weights on both sides (converted via
``csm_tpu.checkpoint``), identical ``[B, S, 33]`` inputs; compares final
hidden state, c0 logits, and the backbone/decoder losses in fp32.
"""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig

from tests.oracle import jax_params_from_torch, random_csm_batch, torch_csm_from_config


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = CSMConfig.tiny()
    model = torch_csm_from_config(cfg, seed=0)
    params = jax_params_from_torch(model, cfg)
    return cfg, model, params


def _torch_forward(model, batch, with_labels):
    import torch

    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(batch["input_ids"]),
            attention_mask=torch.from_numpy(batch["attention_mask"]).float(),
            labels=torch.from_numpy(batch["labels"]) if with_labels else None,
            use_cache=False,
            return_dict=True,
        )
    return out


def _jax_forward(params, cfg, batch, with_labels):
    import jax.numpy as jnp

    from csm_tpu.models import csm

    return csm.forward(
        params,
        cfg,
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"], jnp.float32),
        labels=jnp.asarray(batch["labels"]) if with_labels else None,
    )


@pytest.mark.parametrize("batch,seq,seed", [(1, 12, 0), (2, 24, 1), (3, 17, 2)])
def test_forward_logits_parity(tiny_pair, batch, seq, seed):
    cfg, model, params = tiny_pair
    data = random_csm_batch(cfg, batch, seq, seed=seed)

    t_out = _torch_forward(model, data, with_labels=False)
    j_out = _jax_forward(params, cfg, data, with_labels=False)

    np.testing.assert_allclose(
        np.asarray(j_out.last_hidden_state),
        t_out.last_hidden_state.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out.logits), t_out.logits.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("batch,seq,seed", [(1, 12, 0), (2, 24, 3), (2, 31, 4)])
def test_loss_parity(tiny_pair, batch, seq, seed):
    cfg, model, params = tiny_pair
    data = random_csm_batch(cfg, batch, seq, seed=seed)

    t_out = _torch_forward(model, data, with_labels=True)
    j_out = _jax_forward(params, cfg, data, with_labels=True)

    np.testing.assert_allclose(
        float(j_out.backbone_loss), t_out.backbone_loss.item(), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(j_out.decoder_loss), t_out.decoder_loss.item(), rtol=2e-4
    )
    np.testing.assert_allclose(float(j_out.loss), t_out.loss.item(), rtol=2e-4)


def test_loss_no_valid_decoder_frames(tiny_pair):
    """Acoustic codebook labels masked → no frame has all-32 valid labels →
    decoder loss exactly 0 (``modeling_csm.py:462-463``); backbone (c0) loss
    still computed."""
    cfg, model, params = tiny_pair
    data = random_csm_batch(cfg, 1, 10, seed=5)
    data["labels"][:, :, 1:32] = -100  # kill acoustic codebook labels, keep c0

    t_out = _torch_forward(model, data, with_labels=True)
    j_out = _jax_forward(params, cfg, data, with_labels=True)

    assert float(j_out.decoder_loss) == 0.0
    assert t_out.decoder_loss.item() == 0.0
    np.testing.assert_allclose(
        float(j_out.backbone_loss), t_out.backbone_loss.item(), rtol=2e-4
    )


@pytest.mark.slow
def test_static_decoder_frame_cap_matches_exact(tiny_pair):
    """With max_decoder_frames >= true count, the capped static selection is
    identical to the default (exact) path."""
    cfg, _, params = tiny_pair
    import jax.numpy as jnp

    from csm_tpu.models import csm

    data = random_csm_batch(cfg, 2, 16, seed=6)
    n_valid = int(np.all(data["labels"][..., :32] != -100, axis=-1).sum())
    assert n_valid > 0

    full = csm.forward(
        params, cfg,
        jnp.asarray(data["input_ids"]), jnp.asarray(data["attention_mask"], jnp.float32),
        labels=jnp.asarray(data["labels"]),
    )
    capped = csm.forward(
        params, cfg,
        jnp.asarray(data["input_ids"]), jnp.asarray(data["attention_mask"], jnp.float32),
        labels=jnp.asarray(data["labels"]), max_decoder_frames=n_valid,
    )
    np.testing.assert_allclose(
        float(capped.decoder_loss), float(full.decoder_loss), rtol=1e-6
    )

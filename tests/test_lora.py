"""LoRA adapter tests: zero-effect init, merge equivalence, adapter-only
training through CSMTrainer on the virtual mesh, merged export."""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig
from csm_tpu.data.collator import CSMDataCollator

from tests.oracle import random_csm_batch
from tests.test_train_loop import SyntheticDataset


@pytest.fixture(scope="module")
def base():
    import jax

    from csm_tpu.models import csm

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_lora_init_is_identity(base):
    """B = 0 at init: merged model == base model exactly."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models import csm
    from csm_tpu.train.lora import apply_lora, init_lora_params

    cfg, params = base
    lora = init_lora_params(jax.random.key(1), params, rank=4)
    merged = apply_lora(params, lora, alpha=16.0, rank=4)
    data = random_csm_batch(cfg, 1, 8, seed=5)
    a = csm.forward(params, cfg, jnp.asarray(data["input_ids"]),
                    jnp.asarray(data["attention_mask"], jnp.float32))
    b = csm.forward(merged, cfg, jnp.asarray(data["input_ids"]),
                    jnp.asarray(data["attention_mask"], jnp.float32))
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                               rtol=1e-6, atol=1e-7)


def test_lora_merge_matches_on_the_fly(base):
    """merge_lora == apply_lora for nonzero adapters (export path)."""
    import jax

    from csm_tpu.train.lora import apply_lora, init_lora_params, merge_lora

    cfg, params = base
    lora = init_lora_params(jax.random.key(2), params, rank=2)
    # Give B nonzero values.
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    m1 = apply_lora(params, lora, alpha=8.0, rank=2)
    m2 = merge_lora(params, lora, alpha=8.0, rank=2)
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # Target matrices actually changed; untouched ones did not.
    assert not np.allclose(
        np.asarray(m1["backbone"]["layers"]["wq"]),
        np.asarray(params["backbone"]["layers"]["wq"]),
    )
    np.testing.assert_array_equal(
        np.asarray(m1["backbone"]["layers"]["wo"]),
        np.asarray(params["backbone"]["layers"]["wo"]),
    )


@pytest.mark.slow
def test_lora_training_descends_and_freezes_base(base, tmp_path):
    """CSMTrainer(lora_rank=4): loss descends, ONLY adapters change, and
    save_model exports a merged checkpoint + adapters."""
    import jax

    from csm_tpu.parallel.mesh import make_mesh
    from csm_tpu.train.args import TrainingArguments
    from csm_tpu.train.loop import CSMTrainer

    cfg, params = base
    args = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=5e-2, save_strategy="no",
        per_device_train_batch_size=1, gradient_accumulation_steps=2,
        max_seq_length=16, mesh_data=2, mesh_model=1,
        lora_rank=4, lora_alpha=16.0,
    )
    ds = SyntheticDataset(cfg, n=4, seq=12, epochs=8)
    coll = CSMDataCollator(text_pad_token_id=0, pad_to_length=16)
    import jax.numpy as jnp

    fresh = jax.tree.map(lambda x: x.copy(), params)
    trainer = CSMTrainer(cfg, fresh, args, ds, data_collator=coll,
                         mesh=make_mesh(2, 1))
    trainer.train()

    log = trainer._metrics_log
    assert log[-1]["loss"] < log[0]["loss"]
    # The frozen base is bit-identical to the original params.
    for a, b in zip(jax.tree.leaves(trainer.base_params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adapters moved away from zero.
    bsum = sum(
        float(np.abs(np.asarray(m["B"])).sum())
        for s in trainer.state.params.values() for m in s.values()
    )
    assert bsum > 0

    trainer.save_model(str(tmp_path))
    import os

    assert os.path.exists(os.path.join(tmp_path, "adapters"))
    from csm_tpu.checkpoint import load_checkpoint

    merged = load_checkpoint(os.path.join(tmp_path, "model"), 0)["params"]
    # Merged export differs from the base on the LoRA targets.
    assert not np.allclose(
        np.asarray(merged["backbone"]["layers"]["wq"]),
        np.asarray(params["backbone"]["layers"]["wq"]),
    )

"""Tensor-parallel inference on the virtual 8-device CPU mesh.

The mesh rules (:mod:`csm_tpu.parallel.mesh`) are layout metadata — the
same generation program runs unsharded or under a TP/DP mesh, with XLA
inserting the collectives.  These tests pin that down for INFERENCE (the
train-loop tests cover training): sharded greedy generation must produce
the same tokens as the single-device run.
"""

import numpy as np
import pytest

from csm_tpu.config import CSMConfig

from tests.oracle import random_csm_batch


@pytest.fixture(scope="module")
def setup():
    import jax

    from csm_tpu.models import csm

    cfg = CSMConfig.tiny()
    params = csm.init_params(jax.random.key(0), cfg)
    data = random_csm_batch(cfg, 2, 10, seed=3)
    return cfg, params, data


def _generate(params, cfg, data, mesh=None):
    import jax
    import jax.numpy as jnp

    from csm_tpu.generation import generate_compiled
    from csm_tpu.parallel.mesh import shard_params

    if mesh is not None:
        params = shard_params(params, mesh)
    frames, n = generate_compiled(
        params, cfg,
        jnp.asarray(data["input_ids"]),
        jnp.asarray(data["attention_mask"], jnp.float32),
        jnp.int32(data["input_ids"].shape[1]), jax.random.key(7),
        max_new_frames=3, temperature=1.0, topk=5, greedy=True,
        stop_on_all_zeros=False,
    )
    return np.asarray(frames)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(1, 2), (2, 2), (4, 1)])
def test_sharded_generation_matches_unsharded(setup, shape):
    """Greedy tokens are identical under TP / DP×TP / DP meshes."""
    from csm_tpu.parallel.mesh import make_mesh

    cfg, params, data = setup
    ref = _generate(params, cfg, data)
    mesh = make_mesh(data=shape[0], model=shape[1])
    with mesh:
        got = _generate(params, cfg, data, mesh=mesh)
    np.testing.assert_array_equal(got, ref)


def test_sharded_params_actually_distributed(setup):
    """Sanity: TP sharding places distinct shards on distinct devices."""
    import jax

    from csm_tpu.parallel.mesh import make_mesh, shard_params

    cfg, params, _ = setup
    mesh = make_mesh(data=1, model=2)
    sp = shard_params(params, mesh)
    wq = sp["backbone"]["layers"]["wq"]
    assert len(wq.sharding.device_set) == 2
    # Each device holds half the head dimension.
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    full = params["backbone"]["layers"]["wq"].shape
    assert shard_shapes == {(full[0], full[1], full[2] // 2)}

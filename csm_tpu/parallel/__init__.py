"""Device-mesh parallelism: mesh construction and named sharding rules.

The reference's only parallelism is implicit DDP through HF Trainer
(SURVEY §2c).  Here a ``jax.sharding.Mesh`` is first-class: data parallelism
over the ``data`` axis is the baseline, and every parameter carries a named
partition spec so tensor parallelism over the ``model`` axis (Megatron-style
head/FFN sharding) composes without touching model code — XLA inserts the
collectives over ICI.
"""

from csm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    maybe_init_distributed,
    param_sharding,
    put_global_batch,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "maybe_init_distributed",
    "param_sharding",
    "batch_sharding",
    "put_global_batch",
    "shard_params",
    "shard_batch",
]

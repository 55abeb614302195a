"""Mesh + sharding rules for CSM parameters and batches.

Axes:
- ``data``: batch-dimension data parallelism (the reference-equivalent
  capability — HF Trainer DDP, ``train.py:414-425``); gradients all-reduce
  over this axis, compiled by XLA.
- ``seq``: sequence parallelism — the training batch's frame dimension is
  sharded so per-device activation memory scales by ``1/seq`` (attention
  K/V all-gathers inserted by XLA's SPMD partitioner).
- ``model``: Megatron-style tensor parallelism — attention projections are
  sharded on the head dimension, the gated MLP on the FFN dimension, and the
  classification heads on the vocab dimension.

These rules are layout metadata only; the model code never mentions an axis
name, so DP-only (``model=1``) and TP×DP meshes run the same program.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Env-guarded multi-host bootstrap — the TPU counterpart of the
    reference's ``torchrun`` DDP reach (``/root/reference/train.py:414-425``).

    Activation (before any backend is touched):

    - ``CSM_TPU_COORDINATOR=host:port`` plus ``CSM_TPU_NUM_PROCESSES`` and
      ``CSM_TPU_PROCESS_ID`` → explicit ``jax.distributed.initialize``
      (works for CPU simulations and manual TPU bring-up);
    - ``CSM_TPU_MULTIHOST=1`` alone → argument-free
      ``jax.distributed.initialize()`` (TPU pods self-discover via the
      metadata service).

    After init, ``jax.devices()`` is the GLOBAL device list, so
    :func:`make_mesh` spans hosts: the ``model`` axis stays within a host
    (ICI) and the ``data`` axis crosses hosts (DCN) — gradient all-reduce
    over ``data`` is the only DCN collective, the standard DP-over-DCN
    layout.  Returns True iff distributed mode was initialized; a no-op
    single-host run returns False and nothing changes.
    """
    import os

    addr = os.environ.get("CSM_TPU_COORDINATOR")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["CSM_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["CSM_TPU_PROCESS_ID"]),
        )
        return True
    if os.environ.get("CSM_TPU_MULTIHOST") == "1":
        jax.distributed.initialize()
        return True
    return False


def make_mesh(
    data: Optional[int] = None, model: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, seq, model)`` mesh.  ``data`` defaults to
    ``len(devices) // (seq * model)``.

    ``seq`` is the sequence-parallel axis: the training batch's frame
    dimension is sharded over it (``CSMTrainer`` / ``make_train_step``),
    splitting per-device activation memory by ``seq`` — the lever for
    pushing past the single-chip context ceiling the reference caps at
    2048 frames (``/root/reference/modeling_csm.py:67``).  XLA's SPMD
    partitioner inserts the attention K/V all-gathers; ``seq == 1``
    (default) compiles the identical program as the old 2-axis mesh.

    ``jax.devices()`` orders devices process-major, so the reshape keeps
    the ``model`` (and ``seq``) axes inside each process (ICI) and spreads
    ``data`` across processes (DCN) whenever ``seq * model`` divides the
    per-process device count — the right collective topology for
    multi-host DP (:func:`maybe_init_distributed`).
    """
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // (seq * model)
    n = data * seq * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{seq}x{model} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(data, seq, model)
    return Mesh(grid, ("data", "seq", "model"))


def _llama_rules() -> dict:
    """Partition specs for one stacked Llama stack (leading axis = layers)."""
    return {
        "layers": {
            "attn_norm": P(),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "mlp_norm": P(),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        },
        "final_norm": P(),
    }


def _specs() -> dict:
    return {
        "backbone": _llama_rules(),
        "decoder": _llama_rules(),
        # Embedding tables: shard the (large) vocab rows over the model axis;
        # gathers become XLA collectives.
        "text_embeddings": P("model", None),
        "audio_embeddings": P("model", None),
        "projection": P(),
        # NOTE: the classification heads' vocab dim is 2051 (odd,
        # ``modeling_csm.py:64``) — indivisible by any mesh, so these fall
        # back to replicated via the divisibility check below.
        "codebook0_head": P(None, "model"),
        "audio_head": P(None, None, "model"),
    }


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on any dim the mesh doesn't divide evenly (e.g. the odd
    2051 audio vocab): per-axis graceful fallback to replication."""
    axes = list(spec) + [None] * (len(shape) - len(spec))
    fitted = [
        a if (a is None or shape[i] % mesh.shape[a] == 0) else None
        for i, a in enumerate(axes)
    ]
    return P(*fitted)


def param_sharding(mesh: Mesh, params: Optional[dict] = None) -> dict:
    """Pytree of NamedShardings matching :func:`csm_tpu.models.csm.init_params`.

    With ``params`` given, specs are fitted to actual shapes (indivisible
    dims replicate); without, the raw specs are used.
    """
    specs = _specs()
    if params is None:
        return jax.tree.map(
            lambda spec: NamedSharding(mesh, spec),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        )
    return jax.tree.map(
        lambda spec, x: NamedSharding(mesh, _fit_spec(spec, x.shape, mesh)),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard on the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def shard_params(params: dict, mesh: Mesh) -> dict:
    return jax.device_put(params, param_sharding(mesh, params))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def put_global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Place host batches under ``sharding``, multi-host aware.

    Single-process: plain ``device_put``.  Multi-process: every process
    holds the FULL global batch on host (the data pipeline is deterministic
    by item index, so all processes materialize the same arrays) and
    ``jax.make_array_from_process_local_data`` carves out the rows this
    process's devices own — no cross-host data movement.  ``global_shape``
    must be passed explicitly: without it the helper treats the local array
    as this process's SHARD and concatenates P duplicated copies into a
    P×-larger global batch (silent data duplication).
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(jax.numpy.asarray(v), sharding) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        arr = jax.make_array_from_process_local_data(
            sharding, v, global_shape=v.shape
        )
        assert arr.shape == v.shape, (arr.shape, v.shape)
        out[k] = arr
    return out

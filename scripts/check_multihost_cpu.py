#!/usr/bin/env python
"""Two-process CPU simulation of the multi-host training path.

Spawns 2 coordinated processes (jax.distributed over localhost), each with 2
virtual CPU devices, builds the global 4-device ``{data: 4}`` mesh through
:func:`csm_tpu.parallel.mesh.maybe_init_distributed` + ``make_mesh``, places
a global batch with :func:`put_global_batch`
(``jax.make_array_from_process_local_data``), and runs one jitted train step
— the same code path ``train.py`` takes on a real multi-host TPU pod (DCN
data parallelism, the reference's torchrun-DDP analog,
``/root/reference/train.py:414-425``).

Passes iff both processes report the same finite loss.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from csm_tpu.parallel.mesh import (
    make_mesh, maybe_init_distributed, put_global_batch,
)

assert maybe_init_distributed(), "env guard did not trigger"
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm
from csm_tpu.train.loop import TrainState, make_optimizer, make_train_step

cfg = CSMConfig.tiny()
mesh = make_mesh(data=4, model=1)
params = csm.init_params(jax.random.key(0), cfg)
opt = make_optimizer(1e-3, total_steps=10)
step = jax.jit(make_train_step(cfg, opt, max_decoder_frames=8), donate_argnums=(0,))

rng = np.random.default_rng(0)  # same on every process (index-deterministic)
S = 8
ids = np.zeros((1, 4, S, 33), np.int32)
mask = np.zeros((1, 4, S, 33), np.float32)
labels = np.full((1, 4, S, 33), -100, np.int32)
# two text frames, then audio frames with full labels (loss-bearing)
ids[..., :2, 32] = rng.integers(1, cfg.text_vocab_size, (1, 4, 2))
mask[..., :2, 32] = 1
ids[..., 2:, :32] = rng.integers(1, cfg.audio_vocab_size, (1, 4, S - 2, 32))
mask[..., 2:, :32] = 1
labels[..., 2:, :32] = ids[..., 2:, :32]

with mesh:
    pshard = NamedSharding(mesh, P())
    params = jax.device_put(params, jax.tree.map(lambda _: pshard, params))
    state = TrainState(params=params, opt_state=jax.jit(opt.init)(params),
                       step=jnp.int32(0))
    batch = put_global_batch(
        {"input_ids": ids, "attention_mask": mask, "labels": labels},
        NamedSharding(mesh, P(None, "data")),
    )
    # The global batch must keep the HOST batch's shape — a
    # make_array_from_process_local_data call without global_shape would
    # silently concatenate P duplicated copies (P× batch, every example
    # seen P times); and each local shard must hold exactly the data-axis
    # rows this process's devices own.
    g = batch["input_ids"]
    assert g.shape == ids.shape, f"global batch {g.shape} != host {ids.shape}"
    for shard in g.addressable_shards:
        want = ids[shard.index]
        np.testing.assert_array_equal(np.asarray(shard.data), want)
    state, metrics = step(state, None, batch)
print(f"RESULT {jax.process_index()} loss={float(metrics['loss']):.6f}")
"""


def main():
    port = 29765
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            CSM_TPU_COORDINATOR=f"localhost:{port}",
            CSM_TPU_NUM_PROCESSES="2",
            CSM_TPU_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    ok = True
    for p in procs:
        out, err = p.communicate(timeout=420)
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            ok = False
        outs.append(out)
    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                print(line)
                losses.append(float(line.split("loss=")[1]))
    ok = ok and len(losses) == 2 and abs(losses[0] - losses[1]) < 1e-6
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

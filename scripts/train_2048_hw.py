#!/usr/bin/env python
"""Full-context CSM-1B training on one chip: run the shipped train step at
S=2048 frames on the real TPU and report ms/step + peak HBM.

This is the capability the reference exercises through torch SDPA's
memory-efficient attention under HF Trainer (max_seq_len 2048,
``/root/reference/modeling_csm.py:345-354``, ``train.py:374-383``) — here it
rides the Pallas flash-attention VJP + jax.checkpoint remat over the layer
scan (round-3 additions; before them the gradient path forced XLA attention,
whose O(S²·heads·layers) probabilities cannot fit 16 GB at S=2048).

Flags: ``--seq N`` (default 2048), ``--steps N`` (default 3), ``--no-remat``,
``--xla-attn`` (ablations), ``--accum N`` (default 1).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="auto",
                    choices=("auto", "nothing", "dots"))
    ap.add_argument("--xla-attn", action="store_true")
    args = ap.parse_args()

    setup_cache(jax)
    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops import attention
    from csm_tpu.train.loop import make_optimizer, make_train_step, TrainState

    if args.xla_attn:
        attention.set_attention_impl("xla")

    config = CSMConfig()
    S = args.seq
    print(f"init CSM-1B params (bf16), S={S}, accum={args.accum}, "
          f"remat={not args.no_remat}, attn={'xla' if args.xla_attn else 'flash'}",
          file=sys.stderr)
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    np.asarray(params["projection"])  # materialize

    optimizer = make_optimizer(5e-6, total_steps=100)
    # Reference amortization ratio 16 → ≤ ceil(S/16)+1 decoder-loss frames.
    max_dec = S // 16 + 1
    step_fn = jax.jit(
        make_train_step(config, optimizer, max_dec,
                        remat=not args.no_remat,
                        remat_policy=args.remat_policy),
        donate_argnums=(0,),
    )
    opt_state = jax.jit(optimizer.init)(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))

    # Synthetic full-length conversation — the SAME recipe bench.py's train
    # section measures (csm_tpu/utils/synthetic.py).
    from csm_tpu.utils.synthetic import synthetic_conversation_batch

    batch = {
        k: jnp.asarray(v) for k, v in synthetic_conversation_batch(
            config, S, accum=args.accum, seed=0
        ).items()
    }

    from _bench_lib import record_check

    tag = (f"train_S{S}_{'xla' if args.xla_attn else 'flash'}"
           f"{'_noremat' if args.no_remat else ''}"
           f"{'_' + args.remat_policy if args.remat_policy != 'nothing' else ''}")
    t0 = time.time()
    try:
        state, metrics = step_fn(state, None, batch)
        loss0 = float(metrics["loss"])
    except Exception as e:  # RESOURCE_EXHAUSTED etc. — a result, record it
        msg = str(e).splitlines()[0][:200]
        print(f"FAILED: {msg}")
        if args.no_remat:
            # --no-remat EXISTS to prove the full-context step does not fit
            # without rematerialization — compile failure/OOM here is the
            # expected result, not a broken check.
            record_check(tag, True, expected_oom=True, error=msg)
            return 0
        record_check(tag, False, error=msg)
        return 1
    print(f"compile+first step: {time.time()-t0:.1f}s  loss={loss0:.4f}",
          file=sys.stderr)

    times = []
    for _ in range(args.steps):
        t0 = time.time()
        state, metrics = step_fn(state, None, batch)
        loss = float(metrics["loss"])  # host transfer = true sync
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    print(f"S={S} train step: median {med*1000:.1f} ms over {args.steps} "
          f"(spread {min(times)*1000:.1f}-{max(times)*1000:.1f}), "
          f"loss {loss:.4f} (finite={np.isfinite(loss)}), "
          f"grad_norm {float(metrics['grad_norm']):.3f}")
    print(f"peak HBM: {peak:.2f} GiB" if peak else f"memory_stats: {stats}")
    record_check(
        tag, bool(np.isfinite(loss)), ms_per_step=float(med * 1000),
        loss_first=loss0, loss_last=float(loss),
        peak_hbm_gib=float(peak) if peak else None,
    )
    return 0 if np.isfinite(loss) else 1


if __name__ == "__main__":
    sys.exit(main())

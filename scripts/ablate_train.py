#!/usr/bin/env python
"""Train-step MFU ablations at S=2048 on the real chip (VERDICT r3 #6).

One variant per invocation (the flash block cap is read at trace time, so
each variant needs a fresh process):

    python scripts/ablate_train.py                 # baseline (dots policy)
    python scripts/ablate_train.py --max-dec 1     # decoder loss ~off
    python scripts/ablate_train.py --no-c0-loss    # FORWARD-only without
                                                   #   labels (no head matmul,
                                                   #   CE, or decoder loss —
                                                   #   compare to --fwd-only)
    CSM_FLASH_BLOCK=512 python scripts/ablate_train.py --tag blk512
    python scripts/ablate_train.py --fwd-only      # loss fwd, no grad/update

Each run records ``train_ablate_<tag>`` in KERNEL_CHECKS.json.  Subtracting
variant times from the baseline localizes where the non-matmul milliseconds
go before touching any kernel.
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

from _bench_lib import record_check, setup_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--max-dec", type=int, default=None,
                    help="decoder-loss frame cap (default S//16+1)")
    ap.add_argument("--no-c0-loss", action="store_true",
                    help="drop labels entirely (no c0 head matmul, no CE; "
                    "decoder loss also gone — isolates the full loss block)")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--remat-policy", default="dots",
                    choices=("auto", "nothing", "dots"))
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    setup_cache(jax)
    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.train.loop import TrainState, make_optimizer, make_train_step
    from csm_tpu.utils.synthetic import synthetic_conversation_batch

    config = CSMConfig()
    S = args.seq
    max_dec = args.max_dec if args.max_dec is not None else S // 16 + 1
    tag = args.tag or (
        "base" if not (args.no_c0_loss or args.fwd_only or args.max_dec)
        else f"maxdec{max_dec}" if args.max_dec is not None
        else "noloss" if args.no_c0_loss
        else "fwdonly"
    )
    blk = os.environ.get("CSM_FLASH_BLOCK")
    if blk:
        tag += f"_blk{blk}"

    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    np.asarray(params["projection"])

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_conversation_batch(config, S, accum=1, seed=0).items()
    }
    if args.no_c0_loss:
        batch.pop("labels", None)

    if args.fwd_only or args.no_c0_loss:
        # Time the (remat-free) forward as jitted directly.  The synthetic
        # batch carries a leading accum dim — drop it for the raw forward.
        batch = {k: v[0] for k, v in batch.items()}

        @jax.jit
        def run(p, b):
            out = csm.forward(
                p, config, b["input_ids"], b["attention_mask"],
                labels=b.get("labels"), max_decoder_frames=max_dec,
                use_flash=True,
            )
            return out.loss if out.loss is not None else out.logits.sum()

        t0 = time.time()
        v = float(np.asarray(run(params, batch)))
        print(f"compile+first: {time.time()-t0:.1f}s  value={v:.4f}",
              file=sys.stderr)
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            np.asarray(run(params, batch))
            times.append(time.time() - t0)
    else:
        optimizer = make_optimizer(5e-6, total_steps=100)
        step_fn = jax.jit(
            make_train_step(config, optimizer, max_dec,
                            remat_policy=args.remat_policy),
            donate_argnums=(0,),
        )
        opt_state = jax.jit(optimizer.init)(params)
        state = TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))
        t0 = time.time()
        state, metrics = step_fn(state, None, batch)
        print(f"compile+first: {time.time()-t0:.1f}s  "
              f"loss={float(metrics['loss']):.4f}", file=sys.stderr)
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, metrics = step_fn(state, None, batch)
            float(metrics["loss"])  # host transfer = sync
            times.append(time.time() - t0)

    med = sorted(times)[len(times) // 2]
    print(f"train ablate [{tag}]: median {med*1000:.1f} ms "
          f"(spread {min(times)*1000:.1f}-{max(times)*1000:.1f})")
    record_check(f"train_ablate_{tag}", True, ms_per_step=float(med * 1000))
    return 0


if __name__ == "__main__":
    sys.exit(main())

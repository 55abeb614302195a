#!/usr/bin/env python
"""Trained-weights fidelity check (hardware): overfit CSM-1B on-chip until
its logits sharpen, then measure TEACHER-FORCED greedy agreement of every
fast tier against the bf16 XLA path on those weights.

This retires the round-4 verdict's "random-init agreement floors are not
evidence" finding (VERDICT.md next-round #1/#2): on sharpened logits,

- the EXACT tier (streamed bf16 backbone kernel, ``ops.bb_kernel`` bits=16,
  + speculative decode, ``ops.specdec``) must agree 100 % — that is its
  contract and the gate here;
- the int8 / int4 tiers get real fidelity numbers (their random-init
  floors — 20 % / 0.3 % token agreement in BENCH_r04 — were measurement
  noise of near-tie argmaxes, not tier quality);
- speculative decode's round count is measured (its throughput claim
  assumes drafts mostly verify — true exactly when agreement is high).

Usage: ``python scripts/train_agreement_hw.py [steps] [frames]``
(defaults 300 / 24).  Writes ``trained_agreement`` to KERNEL_CHECKS.json.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import record_check, setup_cache


def main():
    setup_cache(jax)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from csm_tpu.config import CSMConfig
    from csm_tpu.generation import _next_frame_inputs, decode_frame
    from csm_tpu.models import csm
    from csm_tpu.models.llama import KVCache
    from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
    from csm_tpu.ops.fused_decoder import prepare_fused_decoder
    from csm_tpu.utils.overfit import overfit, pattern_batch

    config = CSMConfig()
    print("init + overfit CSM-1B (bf16)...", file=sys.stderr)
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    np.asarray(params["projection"])
    params, final_loss = overfit(params, config, steps=steps)
    print(f"final overfit loss: {final_loss:.4f}", file=sys.stderr)

    print("build tier bundles...", file=sys.stderr)
    qsb16 = jax.jit(lambda p: prepare_streamed_backbone(p, config, bits=16))(params)
    qsb8 = jax.jit(lambda p: prepare_streamed_backbone(p, config, bits=8))(params)
    qsb4 = jax.jit(lambda p: prepare_streamed_backbone(p, config, bits=4))(params)
    qdec8 = jax.jit(lambda p: prepare_fused_decoder(p, config, head_bits=8))(params)
    np.asarray(qdec8["head_scale"])

    # Reference context: an XLA bf16 greedy free-run from a pattern prompt
    # whose PHASE differs from the training batch (same learned transition,
    # unseen absolute sequence).
    S = 16
    ev = pattern_batch(config, S + 1, batch=1, n_text=8, phase=3)
    ids0 = jnp.asarray(ev["input_ids"][0, :, :S])
    mask0 = jnp.asarray(ev["attention_mask"][0, :, :S])
    cache_len = ((S + F + 127) // 128) * 128

    @jax.jit
    def prefill(p, ids, mask, cache):
        return csm.forward(p, config, ids, mask, cache=cache,
                           flash_prefill=True)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def tf_step(p, ids, mask, cache, qsb_a, qdec_a, mode):
        out = csm.forward(
            p, config, ids, mask, cache=cache,
            qsb=qsb_a if mode != "xla" else None,
        )
        frame = decode_frame(
            p, config, out.last_hidden_state, out.logits, None,
            1.0, 50, True,
            qdec=qdec_a if mode != "xla" else None,
            specdec=mode == "exact",
        )
        # top-2 gap of the c0 logits — the sharpness evidence
        top2 = jax.lax.top_k(out.logits, 2)[0]
        return frame, out.cache, (top2[:, 0] - top2[:, 1]).min()

    # Free-run the XLA path greedily to build the forced context.
    print("build reference context (XLA greedy free-run)...", file=sys.stderr)
    cache = KVCache.create(config.backbone, 1, cache_len, dtype=jnp.bfloat16)
    out0 = prefill(params, ids0, mask0, cache)
    frame0 = jax.jit(lambda p, h, lg: decode_frame(
        p, config, h, lg, None, 1.0, 50, True
    ))(params, out0.last_hidden_state, out0.logits)
    forced = [np.asarray(frame0)[0]]
    cache = out0.cache
    prev = frame0
    for t in range(1, F):
        ids_t, mask_t = _next_frame_inputs(config, prev)
        frame, cache, _ = tf_step(params, ids_t, mask_t, cache, None, None, "xla")
        forced.append(np.asarray(frame)[0])
        prev = frame
    forced = np.stack(forced)  # [F, 32]

    # Teacher-forced agreement per tier over the SAME forced context.
    variants = [
        ("xla", None, None),
        ("exact", qsb16, qdec8),
        ("int8", qsb8, qdec8),
        ("int4", qsb4, qdec8),
    ]
    results, gaps = {}, {}
    for mode, qsb_v, qdec_v in variants:
        print(f"teacher-forced pass: {mode}...", file=sys.stderr)
        cache = KVCache.create(config.backbone, 1, cache_len, dtype=jnp.bfloat16)
        cache = prefill(params, ids0, mask0, cache).cache
        frames_, min_gap = [], np.inf
        prev = jnp.asarray(forced[0][None])
        for t in range(1, F):
            ids_t, mask_t = _next_frame_inputs(config, prev)
            frame, cache, gap = tf_step(
                params, ids_t, mask_t, cache, qsb_v, qdec_v,
                mode if mode in ("xla", "exact") else "quant",
            )
            frames_.append(np.asarray(frame))
            min_gap = min(min_gap, float(gap))
            prev = jnp.asarray(forced[t][None])
        results[mode] = np.stack(frames_)
        gaps[mode] = min_gap

    fr_x = results["xla"]
    ok = True
    stats = {"overfit_loss": float(final_loss), "overfit_steps": steps,
             "frames": int(F - 1),
             "xla_min_c0_top2_gap": float(gaps["xla"])}
    for mode in ("exact", "int8", "int4"):
        fr_q = results[mode]
        tok = 100.0 * float((fr_x == fr_q).mean())
        c0 = 100.0 * float((fr_x[:, :, 0] == fr_q[:, :, 0]).mean())
        stats[f"{mode}_token_agreement_pct"] = tok
        stats[f"{mode}_c0_agreement_pct"] = c0
        print(f"{mode}: token agreement {tok:.2f}%  c0 {c0:.2f}%")
    # GATE the exact tier at 100% when the logits are decisively sharp
    # (min top-2 gap well above the ~0.07 absolute Mosaic-vs-XLA rounding
    # noise measured by check_bb_hw).  A mid-sharpness run (small ``steps``)
    # reports agreement without the hard gate — near-tie decisions can
    # legitimately flip there, which is the honest fidelity picture.
    sharp = gaps["xla"] > 0.5
    if sharp:
        ok &= stats["exact_token_agreement_pct"] == 100.0
    stats["gated"] = bool(sharp)

    # Speculative-decode rounds on the trained weights (throughput evidence).
    from csm_tpu.ops.specdec import decode_frame_specdec

    @jax.jit
    def spec_rounds(p, q, h, lg):
        return decode_frame_specdec(
            p, q, config, h, lg, None, 1.0, 50, True, return_rounds=True
        )[1]

    cache = KVCache.create(config.backbone, 1, cache_len, dtype=jnp.bfloat16)
    cache = prefill(params, ids0, mask0, cache).cache
    rounds = []
    prev = jnp.asarray(forced[0][None])
    for t in range(1, min(F, 9)):
        ids_t, mask_t = _next_frame_inputs(config, prev)
        out = jax.jit(lambda p, q, i, m, c: csm.forward(
            p, config, i, m, cache=c, qsb=q))(params, qsb16, ids_t, mask_t, cache)
        rounds.append(int(spec_rounds(params, qdec8, out.last_hidden_state,
                                      out.logits)))
        cache = out.cache
        prev = jnp.asarray(forced[t][None])
    stats["specdec_mean_rounds"] = float(np.mean(rounds))
    stats["specdec_max_rounds"] = int(np.max(rounds))
    print(f"specdec rounds on trained weights: mean {np.mean(rounds):.2f} "
          f"max {np.max(rounds)} (of {len(rounds)} frames)")

    name = "trained_agreement" if steps >= 100 else f"trained_agreement_s{steps}"
    record_check(name, bool(ok), **stats)
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

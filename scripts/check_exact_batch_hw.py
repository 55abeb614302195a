#!/usr/bin/env python
"""EXACT-tier BATCHED serving check (hardware): the bf16-parity tier at
batch 8, gated on free-run greedy token identity with the plain XLA path.

Round 5 met the north star single-stream (175 f/s with 100 % greedy
agreement); this extends the SAME exactness contract to batched serving:
``generate_compiled(qsb=bits16, qdec=int8-draft, specdec=True)`` at B=8 —
the streamed bf16 backbone kernel is hardware-validated at B=8
(KERNEL_CHECKS ``bb_kernel_B8_W256_exact``, 3.06 ms/step at 81 % HBM
util) and the speculative draft kernel's resident cap IS 8
(``fused_decoder.MAX_VALIDATED_B``), so every piece batches without a new
code path.

Gate: on on-chip-sharpened weights (``csm_tpu.utils.overfit`` — the same
fidelity instrument the bench's section 8 and
``scripts/train_agreement_hw.py`` use), a greedy FREE-RUN of the exact
tier must emit token-for-token the XLA bf16 path's frames across all 8
streams (free-run is the stricter form of the teacher-forced agreement
gate: one flipped pick cascades).  Also records the tier's aggregate
throughput and the XLA path's on the same shapes.

Usage: ``python scripts/check_exact_batch_hw.py [steps] [batch] [frames]``
(defaults 250 / 8 / 90).  Writes ``exact_batch{B}_serving`` to
KERNEL_CHECKS.json.

Reference contract being preserved at batch: the incremental decode loop
of ``/root/reference/modeling_csm.py:640-690`` (greedy picks of the bf16
path), batched row-wise.
"""

from __future__ import annotations

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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    reps = 3

    from csm_tpu.config import CSMConfig
    from csm_tpu.generation import generate_compiled
    from csm_tpu.models import csm
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

    qsb16 = jax.jit(lambda p: prepare_streamed_backbone(p, config, bits=16))(
        params
    )
    qdec8 = jax.jit(lambda p: prepare_fused_decoder(p, config, head_bits=8))(
        params
    )
    np.asarray(qdec8["head_scale"])

    # Pattern prompts (phase-shifted off the training batch: same learned
    # transition, unseen absolute sequence), one chain per stream.
    S = 16
    ev = pattern_batch(config, S + 1, batch=B, n_text=8, phase=3)
    ids = jnp.asarray(ev["input_ids"][0, :, :S])
    mask = jnp.asarray(ev["attention_mask"][0, :, :S])

    def run(use_exact, key, max_new=F):
        frames, n = generate_compiled(
            params, config, ids, mask, jnp.int32(S), key,
            max_new_frames=max_new, temperature=1.0, topk=50, greedy=True,
            stop_on_all_zeros=False, stop_mode="stream",
            qdec=qdec8 if use_exact else None,
            qsb=qsb16 if use_exact else None,
            specdec=use_exact,
        )
        return np.asarray(frames), int(np.asarray(n).sum())

    print(f"free-run parity gate (B={B}, F={F})...", file=sys.stderr)
    t0 = time.time()
    fx, _ = run(False, jax.random.key(7))
    print(f"  xla compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    fe, tot = run(True, jax.random.key(7))
    print(f"  exact compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    agree = 100.0 * float((fx == fe).mean())
    c0_agree = 100.0 * float((fx[:, :, 0] == fe[:, :, 0]).mean())
    print(f"free-run agreement: tokens {agree:.2f}%  c0 {c0_agree:.2f}%")

    print("exact-tier timing...", file=sys.stderr)
    times = []
    for i in range(reps):
        t0 = time.time()
        _, tot = run(True, jax.random.key(10 + i))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    fps = tot / med
    print("xla-path timing (same shapes)...", file=sys.stderr)
    t0 = time.time()
    _, totx = run(False, jax.random.key(20))
    fps_x = totx / (time.time() - t0)
    print(
        f"exact B={B}: {fps:.1f} f/s aggregate "
        f"({1000.0 * med / max(tot // B, 1):.2f} ms/frame/stream; "
        f"xla path {fps_x:.1f} f/s)"
    )

    ok = agree == 100.0
    record_check(
        f"exact_batch{B}_serving", bool(ok),
        agg_frames_per_s=float(fps),
        xla_agg_frames_per_s=float(fps_x),
        token_agreement_pct=float(agree),
        c0_agreement_pct=float(c0_agree),
        frames=int(F), batch=int(B),
        spread_pct=100.0 * (max(times) - min(times)) / med,
        overfit_steps=steps, overfit_loss=float(final_loss),
    )
    print(f"exact_batch{B}_serving: {'OK' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

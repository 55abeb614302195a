#!/usr/bin/env python
"""Hardware check for the streamed-weight backbone kernel: Mosaic-compiled
kernel vs the jitted pure-JAX emulator at full CSM-1B scale, plus an
in-program timing of the kernel alone (scan-amortized)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import setup_cache, timed




def main():
    setup_cache(jax)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops import bb_kernel
    from csm_tpu.ops.bb_kernel import (
        bb_decode_step, emulate_bb_decode_step, prepare_streamed_backbone,
    )

    config = CSMConfig()
    bcfg = config.backbone
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    # This script IS the validation that sets MAX_VALIDATED_B — force the
    # forward-path dispatch to take the kernel at the B under test (else a
    # not-yet-validated B would silently measure the XLA fallback).
    bb_kernel.MAX_VALIDATED_B = max(bb_kernel.MAX_VALIDATED_B, B)
    bb_kernel.MAX_VALIDATED_B_EXACT = max(bb_kernel.MAX_VALIDATED_B_EXACT, B)
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    qsb = jax.jit(lambda p: prepare_streamed_backbone(p, config, bits=bits))(params)
    np.asarray(qsb["final_norm"])

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(0.1 * rng.standard_normal((B, bcfg.hidden_size)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((B, bcfg.head_dim)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((B, bcfg.head_dim)), jnp.float32)
    valid = rng.random((B, W)) < 0.6
    bias = jnp.where(jnp.asarray(valid), 0.0, -1e9).astype(jnp.float32)
    shape = (bcfg.num_hidden_layers, B, W, bcfg.num_key_value_heads, bcfg.head_dim)
    kc = jnp.asarray(0.3 * rng.standard_normal(shape), jnp.bfloat16)
    vc = jnp.asarray(0.3 * rng.standard_normal(shape), jnp.bfloat16)

    kern = jax.jit(lambda q, *a: bb_decode_step(q, config, *a))
    emu = jax.jit(lambda q, *a: emulate_bb_decode_step(q, config, *a))
    out_k = kern(qsb, h0, cos, sin, bias, kc, vc)
    out_e = emu(qsb, h0, cos, sin, bias, kc, vc)
    ok = True
    # Mosaic and XLA may tile a dot's accumulation differently on the chip;
    # each bf16 operand cast then rounds a 1-ulp-different value, and 16
    # residual layers compound that to a few percent on the worst element.
    # The CPU interpreter tests pin BIT-exactness of the math itself; the
    # hardware contract here is "within a few bf16 ulps after 16 layers".
    # int4 gate is slightly looser: the W4 grid's coarser steps amplify
    # the same Mosaic-vs-XLA accumulation-order deltas (B=1 measured
    # 3.1e-2 worst element vs int8's 1.6e-2); the behavioral gates below
    # (greedy match + near-tie explanation) are unchanged.
    # bits=16 (EXACT bf16 tier): the per-dot bf16 rounding QUANTIZES the
    # Mosaic-vs-XLA accumulation-order noise — a sum landing within half a
    # bf16 ulp of a rounding boundary rounds differently on the two
    # backends, injecting a full-ulp (2^-8 relative) delta that 16 residual
    # layers compound (measured 2.5e-2 worst element at B=1, i.e. the same
    # scale as the int8 tier's raw noise).  Bit-exactness across the
    # backends is NOT achievable for any kernel; the tier's parity contract
    # is greedy agreement on real (sharpened) logits, pinned by
    # scripts/train_agreement_hw.py on trained weights.
    rel_gate = {4: 4e-2, 8: 3e-2, 16: 3e-2}[bits]
    for name, a, b in zip(("nh", "logits", "nk", "nv"), out_k, out_e):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale_ref = np.abs(b).max() + 1e-9
        rel = np.abs(a - b).max() / scale_ref
        passed = rel < rel_gate
        ok &= bool(passed)
        print(f"{name:8s}: rel={rel:.2e} max|d|={np.abs(a-b).max():.3e} "
              f"({'OK' if passed else 'FAIL'})")

    # Accuracy contract vs the bf16 XLA decode path (same as test_quant's
    # int8 contract, at full 1B scale): greedy c0 must agree.
    from csm_tpu.models.llama import KVCache

    # per-draw ids are built in the loop below
    mask = jnp.ones((B, 1, config.frame_width), jnp.float32)
    fill = W // 2
    cache = KVCache.create(config.backbone, B, W, dtype=jnp.bfloat16)
    cache = cache.replace(
        k=kc.reshape(cache.k.shape) * 0.0 + kc.reshape(cache.k.shape),
        v=vc.reshape(cache.v.shape),
        valid=cache.valid.at[:, :fill].set(True),
        index=jnp.int32(fill),
    )

    @jax.jit
    def xla_step(p, c, i):
        out = csm.forward(p, config, i, mask, cache=c)
        return out.last_hidden_state, out.logits

    @jax.jit
    def qsb_step(p, q, c, i):
        out = csm.forward(p, config, i, mask, cache=c, qsb=q)
        return out.last_hidden_state, out.logits

    from csm_tpu.ops.rope import compute_rope_table

    rope = compute_rope_table(config.backbone, config.max_seq_len)
    pos = jnp.full((B,), fill, jnp.int32)
    cos_d = jnp.take(rope[0], pos, axis=0)
    sin_d = jnp.take(rope[1], pos, axis=0)
    bias_d = jnp.where(cache.valid, 0.0, -1e9).astype(jnp.float32)

    # The pure-JAX emulator's chunk-unrolled program grows with B and trips
    # the remote-compile tunnel's request-size limit at B=32 (HTTP 413) —
    # its math is row-independent, so the emulator gate runs in row GROUPS
    # of <=16 covering EVERY row (B=32 -> rows 0:16 and 16:32, so both
    # halves of the grouped _attend_flat path get the near-tie gate; the
    # kernel still runs and is timed at the full B).
    groups = [(s, min(s + 16, B)) for s in range(0, B, 16)]

    @functools.partial(jax.jit, static_argnames=("s", "e"))
    def emu_logits(p, q, i, kc, vc, s, e):
        # kc/vc ride as ARGUMENTS — closing over the cache would embed it
        # as a multi-MB program constant and trip the remote-compile
        # tunnel's request-size limit at large B.
        h0_d = csm.embed_frames(p, config, i[s:e], mask[s:e])[:, 0, :]
        return emulate_bb_decode_step(
            q, config, h0_d, cos_d[s:e], sin_d[s:e], bias_d[s:e], kc, vc
        )[1]

    # GATE: greedy c0 agreement kernel-vs-EMULATOR (same quantized weights,
    # so only Mosaic-vs-XLA dot tiling differs; a near-tied top pair may
    # flip on one draw).  The unquantized-bf16 comparison is reported for
    # context but gated only loosely — its deltas are dominated by the
    # int8 weight quantization that the accepted W8A16 XLA path shares.
    lg_rels, m_emu, m_bf16 = [], 0, 0
    n_draws = 4
    rows = n_draws * B
    rows_emu = n_draws * B
    for d in range(n_draws):
        ids_d = jnp.zeros((B, 1, config.frame_width), jnp.int32).at[..., :-1].set(
            jnp.asarray(
                np.random.default_rng(d).integers(
                    1, config.audio_vocab_size, (B, 1, 32)
                )
            )
        )
        lh_ref, lg_ref = xla_step(params, cache, ids_d)
        lh_q, lg_q = qsb_step(params, qsb, cache, ids_d)
        lg_e = np.concatenate([
            np.asarray(
                emu_logits(
                    params, qsb, ids_d, cache.k[:, s:e], cache.v[:, s:e], s, e
                ),
                np.float64,
            )
            for s, e in groups
        ])
        lg_ref = np.asarray(lg_ref, np.float64)
        lg_q = np.asarray(lg_q, np.float64)
        lg_rels.append(np.abs(lg_q - lg_ref).max() / (np.abs(lg_ref).max() + 1e-9))
        pick_q = np.argmax(lg_q, -1)
        pick_e = np.argmax(lg_e, -1)  # all B rows (grouped calls above)
        m_emu += int(np.sum(pick_q == pick_e))
        m_bf16 += int(np.sum(pick_q == np.argmax(lg_ref, -1)))
        # GATE: every kernel-vs-emulator flip must be a near-tie on the
        # emulator's own logits (a few bf16 ulps) — a real kernel bug
        # produces large gaps.  Random-init logits are tightly packed, so
        # flips themselves are expected, especially at B=8.
        for b_i in np.nonzero(pick_q != pick_e)[0]:
            gap = float(lg_e[b_i, pick_e[b_i]] - lg_e[b_i, pick_q[b_i]])
            if not (abs(gap) < 0.05):
                ok = False
                print(f"  draw {d} row {b_i}: flip NOT near-tie (gap {gap:+.4f})")
        if bits == 16:
            # EXACT tier: any greedy flip vs the bf16 XLA path must be a
            # rounding-noise-scale gap on the XLA logits.  Random-init
            # logits are tightly packed (top-2 gaps comparable to the
            # compounded ulp noise above), so occasional flips here are
            # EXPECTED; a real kernel bug produces O(1) gaps.  The 100%%
            # parity claim is gated on sharpened logits by
            # scripts/train_agreement_hw.py, not on random init.
            pick_r = np.argmax(lg_ref, -1)
            for b_i in np.nonzero(pick_q != pick_r)[0]:
                gap = float(lg_ref[b_i, pick_r[b_i]] - lg_ref[b_i, pick_q[b_i]])
                if not (abs(gap) < 0.15):
                    ok = False
                    print(f"  draw {d} row {b_i}: EXACT-tier flip vs bf16 "
                          f"NOT rounding-noise scale (gap {gap:+.4f})")
    rel = max(lg_rels)
    # The bf16 comparison gates int8 only: int4's 16x-coarser weight grid
    # makes this rel ~0.9 on random-init weights BY DESIGN of the
    # quantization (its fidelity tier is assessed on real weights via the
    # bench's teacher-forced agreement metric); the kernel-bug detectors —
    # the emulator rel gates above and the near-tie flip gate — still apply.
    if bits == 8:
        ok &= bool(rel < 0.15)
    elif bits == 16:
        # Compounded rounding-flip noise scale (see rel_gate note; worst
        # observed 4.24e-2 at W=1024), far below the int8 tier's
        # quantization envelope.
        ok &= bool(rel < 6e-2)
    print(f"greedy c0 rows: kernel==emulator {m_emu}/{rows_emu} "
          f"(gate: flips near-tie explained), "
          f"kernel==bf16-XLA {m_bf16}/{rows} (quant-error context); "
          f"c0-logit rel vs bf16 {rel:.2e}")

    # scan-amortized kernel timing (data dependency through h0)
    def scan_kernel(q, h, kc_a, vc_a, n):
        # the KV window rides as arguments (closure constants of this size
        # trip the remote-compile body limit at B=32)
        def body(hh, _):
            nh, lg, nk, nv = bb_decode_step(
                q, config, hh, cos, sin, bias, kc_a, vc_a
            )
            return nh * 0.01, lg[0, 0]
        _, ls = jax.lax.scan(body, h, None, length=n)
        return ls.sum()

    f = jax.jit(scan_kernel, static_argnames=("n",))
    t_hi = timed(lambda: np.asarray(f(qsb, h0, kc, vc, 40)))
    t_lo = timed(lambda: np.asarray(f(qsb, h0, kc, vc, 5)))
    per = (t_hi - t_lo) / 35
    wlabel = "bf16-EXACT" if bits == 16 else f"W{bits}A16"
    print(f"bb kernel (B={B}, W={W}, {wlabel}): {per:.3f} ms/step "
          f"(XLA int8 path was ~1.57 ms at W=256)")
    from _bench_lib import record_check

    # Kernel-level HBM utilization: the step must stream every int8 weight
    # byte + read the KV window; v5e peak 819 GB/s.
    wbytes = sum(x.nbytes for x in jax.tree.leaves(qsb))
    kvbytes = int(cache.k.nbytes + cache.v.nbytes)
    bw_util = (wbytes + kvbytes) / (per / 1e3) / 1e9 / 819.0
    print(f"bb kernel HBM-bandwidth utilization: {100*bw_util:.1f}% "
          f"({(wbytes+kvbytes)/2**30:.2f} GiB / {per:.2f} ms)")
    record_check(
        f"bb_kernel_B{B}_W{W}"
        + ("" if bits == 8 else ("_exact" if bits == 16 else f"_int{bits}")),
        ok, ms_per_step=float(per),
        hbm_bw_util_pct=float(100 * bw_util),
        c0_logit_rel_vs_bf16=float(rel),
        greedy_match_emulator=f"{m_emu}/{rows_emu}",
        greedy_match_bf16=f"{m_bf16}/{rows}",
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

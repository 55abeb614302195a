#!/usr/bin/env python
"""Full-published-size Mimi codec throughput on the real chip.

The reference runs its codec (``moshi`` Mimi, torch CUDA) inside the data
loader and after generation (``/root/reference/processor.py:284-287``,
``README.md:114-118``) but never publishes codec numbers.  This check
measures the JAX Mimi port at the published size (32 quantizers, SEANet +
8-layer transformer) on the chip:

- ``mimi_decode`` realtime factor: seconds of 24 kHz audio produced per
  second of compute, whole-utterance decode (the README recipe's last step);
- ``mimi_encode`` realtime factor (the processor/data-loader step);
- streaming ``decode_step`` per-frame latency — the number that matters for
  live serving: it must sit well under the 80 ms frame budget.

Weights are random-init (``random_mimi_params``) — codec compute cost is
weight-value-independent, so these are the true performance numbers even
before real ``kyutai/mimi`` weights are reachable.

Results fold into ``KERNEL_CHECKS.json`` (``codec_hw`` key).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_lib import record_check, setup_cache, timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=125, help="12.5 Hz frames")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    setup_cache(jax)

    from csm_tpu.codec import MimiCodecConfig, random_mimi_params
    from csm_tpu.codec.mimi import mimi_decode, mimi_encode
    from csm_tpu.codec.streaming import decode_state_init, decode_step

    cfg = MimiCodecConfig()
    B, F = args.batch, args.frames
    audio_s = F / cfg.frame_rate
    print(f"Mimi full size, B={B}, {F} frames = {audio_s:.1f}s audio", flush=True)

    # Host-side init + device_put: jitting the init would inline ~80M
    # weights as HLO constants and 413 the remote-compile tunnel.
    params = jax.device_put(random_mimi_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (B, cfg.num_quantizers, F)), jnp.int32
    )
    n_samples = int(audio_s * cfg.sampling_rate)
    wave = jnp.asarray(0.1 * rng.standard_normal((B, 1, n_samples)), jnp.float32)

    dec = jax.jit(lambda p, c: mimi_decode(cfg, p, c))
    enc = jax.jit(lambda p, w: mimi_encode(cfg, p, w))

    dec_ms = timed(lambda: np.asarray(dec(params, codes)), reps=args.reps)
    dec_rtf = B * audio_s / (dec_ms / 1e3)
    print(f"decode: {dec_ms:.1f} ms for {audio_s:.1f}s → RTF {dec_rtf:.1f}x")

    enc_ms = timed(lambda: np.asarray(enc(params, wave)), reps=args.reps)
    enc_rtf = B * audio_s / (enc_ms / 1e3)
    print(f"encode: {enc_ms:.1f} ms for {audio_s:.1f}s → RTF {enc_rtf:.1f}x")

    # Streaming decode: one 80 ms frame per step with carried conv/KV state.
    # Per-frame cost is measured by amortizing N steps inside ONE jitted
    # lax.scan (the tunnel's ~30 ms dispatch would otherwise dominate);
    # each step consumes a different frame of codes and threads the state,
    # so XLA can neither hoist nor elide iterations.
    state = decode_state_init(cfg, batch=B)
    n_it = F

    @jax.jit
    def stream_many(p, s, all_codes):  # all_codes [F, B, Q, 1]
        def body(carry, c):
            out, s2 = decode_step(cfg, p, carry, c)
            return s2, jnp.sum(out)
        s, sums = jax.lax.scan(body, s, all_codes)
        return jnp.sum(sums)

    per_frame = codes.transpose(2, 0, 1)[:, :, :, None]  # [F, B, Q, 1]

    def stream_run():
        np.asarray(stream_many(params, state, per_frame))

    stream_ms = timed(stream_run, reps=args.reps) / n_it
    print(f"streaming decode_step: {stream_ms:.2f} ms/frame "
          f"(scan-amortized over {n_it}; budget 80 ms)")

    ok = dec_rtf > 1.0 and enc_rtf > 1.0 and stream_ms < 80.0
    record_check(
        "codec_hw", ok,
        decode_rtf=dec_rtf, encode_rtf=enc_rtf,
        decode_ms=dec_ms, encode_ms=enc_ms,
        stream_step_ms=stream_ms, frames=F, batch=B,
    )
    print(f"ok={ok}")


if __name__ == "__main__":
    main()

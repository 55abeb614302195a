#!/usr/bin/env python
"""Headline benchmark: single-stream CSM-1B frame generation throughput on
one TPU chip.

Baseline (BASELINE.md): the reference's only published figure is ~130 ms of
compute per 80 ms frame on an unspecified GPU — RTF 1.6, i.e. ≈7.69
frames/s.  ``vs_baseline`` is measured frames/s over that 7.69.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Flags: ``--frames N`` (default 64), ``--prompt-frames N`` (default 64),
``--tiny`` (debug: tiny config), ``--batch B`` (extra batched-serving line).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--prompt-frames", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--first-frame", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compilation cache: the 1B while_loop program is expensive to
    # compile through the remote-compile tunnel; cache it across runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_csm")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from csm_tpu.config import CSMConfig
    from csm_tpu.generation import generate_compiled
    from csm_tpu.models import csm

    config = CSMConfig.tiny() if args.tiny else CSMConfig()
    dtype = jnp.bfloat16

    B = args.batch
    S = args.prompt_frames
    rng = np.random.default_rng(0)

    print(f"init CSM params ({'tiny' if args.tiny else '1B'}, bf16)...", file=sys.stderr)
    params = jax.jit(
        lambda k: csm.init_params(k, config, dtype), donate_argnums=()
    )(jax.random.key(0))
    jax.block_until_ready(params)

    # Text-only prompt frames (the TTS configuration in BASELINE.json).
    ids = np.zeros((B, S, config.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, config.text_vocab_size, (B, S))
    mask = np.zeros((B, S, config.frame_width), np.float32)
    mask[..., -1] = 1.0

    kwargs = dict(
        max_new_frames=args.frames,
        temperature=1.0,
        topk=50,
        greedy=False,
        stop_on_all_zeros=False,  # fixed-length run for stable timing
        stop_mode="stream",
    )

    print("compiling generate (first run)...", file=sys.stderr)
    t0 = time.time()
    frames, n = generate_compiled(
        params, config, jnp.asarray(ids), jnp.asarray(mask),
        jnp.int32(S), jax.random.key(1), **kwargs,
    )
    # NOTE: materialize via np.asarray — on this backend block_until_ready
    # does not actually synchronize; only a host transfer is a true barrier.
    np.asarray(frames)
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # Timed runs.
    times = []
    for i in range(3):
        t0 = time.time()
        frames, n = generate_compiled(
            params, config, jnp.asarray(ids), jnp.asarray(mask),
            jnp.int32(S), jax.random.key(2 + i), **kwargs,
        )
        np.asarray(frames)
        times.append(time.time() - t0)
    best = min(times)
    total_frames = int(np.asarray(n).sum())
    fps = total_frames / best

    if args.first_frame:
        # Secondary: first-frame latency (prefill + one frame); costs an
        # extra compile (different static max_new_frames), so opt-in.
        for i in range(2):
            t0 = time.time()
            f1, _ = generate_compiled(
                params, config, jnp.asarray(ids), jnp.asarray(mask),
                jnp.int32(S), jax.random.key(9 + i),
                **{**kwargs, "max_new_frames": 1},
            )
            np.asarray(f1)
            first_frame_ms = (time.time() - t0) * 1000
        print(f"first-frame latency: {first_frame_ms:.1f} ms", file=sys.stderr)

    baseline_fps = 1.0 / 0.130  # reference: ~130 ms per frame (BASELINE.md)
    result = {
        "metric": "csm1b_frames_per_sec_single_stream"
        if B == 1
        else f"csm1b_frames_per_sec_batch{B}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Tracing / profiling / debug toggles.

The reference has no tracing at all (SURVEY §5: its closest artifact is CUDA
memory logging at startup).  Here:

- :func:`trace` wraps a region in a ``jax.profiler`` trace whose output
  loads in TensorBoard / Perfetto;
- :class:`FrameTimer` collects per-step wall-clock counters (frames/s,
  tokens/s) with true host synchronization;
- :func:`enable_nan_checks` flips ``jax_debug_nans`` (the JAX-native
  equivalent of a numerics sanitizer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, name: Optional[str] = None):
    """Profile a region: ``with trace("/tmp/jax-trace"): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        if name is not None:
            with jax.profiler.TraceAnnotation(name):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """True host barrier: transfers one leaf to host.  (On some backends
    ``block_until_ready`` returns before execution finishes; a host transfer
    is always a real synchronization point.)"""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])


class FrameTimer:
    """Wall-clock counters for generation/training loops.

    >>> timer = FrameTimer()
    >>> with timer.step(frames=64):
    ...     out = generate(...)
    ...     sync(out)
    >>> timer.summary()  # {'steps': 1, 'frames_per_sec': ..., ...}
    """

    def __init__(self):
        self.times: List[float] = []
        self.frames: List[int] = []

    @contextlib.contextmanager
    def step(self, frames: int = 1):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        self.frames.append(frames)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        total_t = sum(self.times)
        total_f = sum(self.frames)
        return {
            "steps": len(self.times),
            "total_time_s": total_t,
            "frames_per_sec": total_f / total_t if total_t else float("nan"),
            "mean_step_ms": 1000.0 * total_t / len(self.times),
            "p50_step_ms": 1000.0 * float(np.median(self.times)),
            "audio_realtime_factor": (total_f / 12.5) / total_t if total_t else float("nan"),
        }


def enable_nan_checks(on: bool = True) -> None:
    """Toggle ``jax_debug_nans`` (SURVEY §5 "race detection / sanitizers")."""
    jax.config.update("jax_debug_nans", on)

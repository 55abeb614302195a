"""Utilities: profiling hooks, generation timing counters, debug toggles
(SURVEY §5 — the aux subsystems the reference lacks)."""

from csm_tpu.utils.profiling import (
    FrameTimer,
    enable_nan_checks,
    trace,
)

__all__ = ["trace", "FrameTimer", "enable_nan_checks"]

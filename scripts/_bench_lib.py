"""Shared helpers for the hardware check/ablation scripts.

One copy of the tunnel-aware timing methodology: enable the persistent
compile cache, and time by min-of-reps around fully materialized results
(``np.asarray`` is the only true sync barrier on this backend).
"""

from __future__ import annotations

import time


def setup_cache(jax):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_csm")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timed(fn, reps=5, warmup=2):
    """Min-of-``reps`` wall time of ``fn()`` in ms after ``warmup`` calls.
    ``fn`` must materialize its result (np.asarray) — see module docstring."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3

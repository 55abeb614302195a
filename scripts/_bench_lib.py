"""Shared helpers for the hardware check/ablation scripts.

One copy of the tunnel-aware timing methodology: enable the persistent
compile cache, and time by min-of-reps around fully materialized results
(``np.asarray`` is the only true sync barrier on this backend).
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKS_PATH = os.path.join(REPO, "KERNEL_CHECKS.json")


def record_check(name: str, ok: bool, **fields) -> None:
    """Fold this check's outcome into the machine-readable artifact
    ``KERNEL_CHECKS.json`` (one dict keyed by check name; numbers rounded).
    The judge/driver reads this instead of scraping stdout."""
    entry = {"ok": bool(ok), "ts": int(time.time())}
    for k, v in fields.items():
        entry[k] = round(v, 4) if isinstance(v, float) else v
    # Concurrent check scripts (e.g. a tunnel-recovery watcher) can race on
    # this file: serialize the read-modify-write under an fcntl lock and
    # publish via atomic rename so a crash never leaves a truncated file.
    import fcntl

    lock_path = CHECKS_PATH + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        data = {}
        if os.path.exists(CHECKS_PATH):
            try:
                with open(CHECKS_PATH) as f:
                    data = json.load(f)
            except Exception:
                data = {}
        data[name] = entry
        tmp = CHECKS_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, CHECKS_PATH)


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

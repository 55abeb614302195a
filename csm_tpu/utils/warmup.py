"""Compile-cache warmup: precompile the generation programs a deployment
will hit, so the first real request never pays a JIT compile.

XLA compiles one program per (prompt bucket, frame budget, decoder impl)
combination; at CSM-1B scale a cold compile is tens of seconds (minutes
through a remote-compile tunnel).  Pair with JAX's persistent compilation
cache so warmed programs survive process restarts:

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

Uses AOT lowering (``.lower(...).compile()``): programs compile and enter
the caches without executing a single step.

No reference counterpart (the reference has no compile step at all —
torch eager); this is TPU deployment hygiene.
"""

from __future__ import annotations

import logging
import time
from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from csm_tpu.config import CSMConfig

logger = logging.getLogger(__name__)


def warmup_generation(
    params: dict,
    config: CSMConfig,
    *,
    batch_sizes: Sequence[int] = (1,),
    prompt_buckets: Sequence[int] = (64, 256),
    frame_budgets: Sequence[int] = (64,),
    qdec: Optional[dict] = None,
    qbb: Optional[dict] = None,
    qsb: Optional[dict] = None,
    temperature: float = 1.0,
    topk: int = 50,
    greedy: bool = False,
    stop_on_all_zeros: bool = False,
    stop_mode: str = "stream",
) -> int:
    """Precompile :func:`csm_tpu.generation.generate_compiled` for every
    (batch, prompt bucket, frame budget) combination.  Returns the number
    of programs compiled."""
    from csm_tpu.generation import generate_compiled

    n = 0
    for B in batch_sizes:
        for S in prompt_buckets:
            for frames in frame_budgets:
                ids = jnp.zeros((B, S, config.frame_width), jnp.int32)
                mask = jnp.zeros((B, S, config.frame_width), jnp.float32)
                t0 = time.time()
                generate_compiled.lower(
                    params, config, ids, mask, jnp.int32(S), jax.random.key(0),
                    max_new_frames=frames, temperature=temperature, topk=topk,
                    greedy=greedy, stop_on_all_zeros=stop_on_all_zeros,
                    stop_mode=stop_mode, qdec=qdec, qbb=qbb, qsb=qsb,
                ).compile()
                logger.info(
                    "warmed generate B=%d S=%d frames=%d in %.1fs",
                    B, S, frames, time.time() - t0,
                )
                n += 1
    return n

"""Shared on-device measurement harnesses (tunnel-aware methodology).

One copy of the scan-amortized prefill measurement used by both
``bench.py`` and ``scripts/check_prefill_hw.py`` — the per-program tunnel
dispatch (~30 ms) dwarfs the thing being measured, so N prefills run
inside ONE jitted ``lax.scan`` (with a per-iteration prompt variation so
XLA cannot hoist the body) and the hi/lo iteration-count difference
isolates the per-prefill cost.
"""

from __future__ import annotations

import time

import numpy as np

V5E_BF16_TFLOPS = 197.0


def prefill_ms_on_device(
    params: dict,
    config,
    S: int,
    *,
    dtype=None,
    n_hi: int = 8,
    n_lo: int = 2,
    reps: int = 3,
    seed: int = 0,
) -> float:
    """Per-prefill on-device milliseconds at prompt length ``S`` (text-only
    prompt, flash prefill path, c0 head on the last position — exactly the
    compute ``generate`` pays before its first frame)."""
    import jax
    import jax.numpy as jnp

    from csm_tpu.models import csm
    from csm_tpu.models.llama import KVCache

    if dtype is None:
        dtype = params["backbone"]["final_norm"].dtype
    cache_len = ((S + 128 + 127) // 128) * 128
    rng = np.random.default_rng(seed)
    ids = np.zeros((1, S, config.frame_width), np.int32)
    ids[..., -1] = rng.integers(1, config.text_vocab_size, (1, S))
    mask = np.zeros((1, S, config.frame_width), np.float32)
    mask[..., -1] = 1.0
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    def scan_prefill(p, ids_a, mask_a, n):
        cache = KVCache.create(config.backbone, 1, cache_len, dtype=dtype)

        def body(c, k):
            # vary the prompt per iteration so XLA cannot hoist the body
            idv = ids_a.at[:, :, -1].add(k % 3)
            out = csm.forward(p, config, idv, mask_a, cache=cache,
                              flash_prefill=True)
            return c + out.logits.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n, dtype=jnp.int32))
        return acc

    f = jax.jit(scan_prefill, static_argnames=("n",))
    np.asarray(f(params, ids_j, mask_j, n_hi))  # compile
    np.asarray(f(params, ids_j, mask_j, n_lo))
    ts_hi, ts_lo = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(params, ids_j, mask_j, n_hi))
        ts_hi.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f(params, ids_j, mask_j, n_lo))
        ts_lo.append(time.perf_counter() - t0)
    return 1000.0 * (min(ts_hi) - min(ts_lo)) / (n_hi - n_lo)


def prefill_flops(params: dict, config, S: int) -> float:
    """Model FLOPs of one prefill: 2·N·S over the backbone matmul params
    (embedding gathers are not FLOPs) + causal attention (qk + pv over the
    causal half-square)."""
    import jax

    bb = config.backbone
    bb_mm = sum(
        int(np.prod(x.shape))
        for x in jax.tree.leaves(params["backbone"]["layers"])
    )
    attn_fwd = 2 * 2 * S * S * bb.num_attention_heads * bb.head_dim * \
        bb.num_hidden_layers / 2
    return 2.0 * bb_mm * S + attn_fwd

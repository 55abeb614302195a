#!/usr/bin/env python
"""Hardware parity check for the fused decoder kernel.

Runs the Mosaic-compiled kernel on the real chip at full CSM-1B scale and
checks:
1. kernel == pure-JAX emulator (same quantized math) for B=1, greedy and
   sampled;
2. batched (B=8) rows == each row's solo run (the continuous-batching
   serving contract).

The CPU test suite covers the same contracts in interpreter mode
(tests/test_fused_decoder.py); this script retires the Mosaic-compilation
risk the interpreter cannot see.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_csm")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from csm_tpu.config import CSMConfig
    from csm_tpu.models import csm
    from csm_tpu.ops.fused_decoder import (
        decode_frame_fused,
        emulate_decode_codebooks,
        fused_decode_codebooks,
        prepare_fused_decoder,
    )

    config = CSMConfig()
    params = jax.jit(lambda k: csm.init_params(k, config, jnp.bfloat16))(
        jax.random.key(0)
    )
    qdec = jax.jit(lambda p: prepare_fused_decoder(p, config))(params)
    np.asarray(qdec["s"]["wq"])

    N = config.audio_num_codebooks
    Va = config.audio_vocab_size
    Dd = config.decoder.hidden_size
    rng = np.random.default_rng(0)

    ok = True
    for greedy in (True, False):
        x_prefill = jnp.asarray(rng.standard_normal((2, Dd)), jnp.float32)
        gumbel = (
            jnp.zeros((N - 1, 1, Va), jnp.float32)
            if greedy
            else jnp.asarray(rng.gumbel(size=(N - 1, 1, Va)), jnp.float32)
        )
        kern = np.asarray(
            jax.jit(
                lambda q, x, g: fused_decode_codebooks(
                    q, config, x[None], g, 1.0, topk=50, greedy=greedy
                )
            )(qdec, x_prefill, gumbel)
        )
        emu = np.asarray(
            jax.jit(
                lambda q, x, g: emulate_decode_codebooks(
                    q, config, x, g, 1.0, topk=50, greedy=greedy
                )
            )(qdec, x_prefill, gumbel)
        )
        match = (kern == emu).all()
        ok &= bool(match)
        print(f"kernel==emulator  greedy={greedy}: "
              f"{'OK' if match else f'MISMATCH {np.sum(kern != emu)}/{kern.size}'}")

    # Batched solo-equality: per-stream keys, B=8 rows vs solo runs.
    B = 8
    last_h = jnp.asarray(rng.standard_normal((B, config.backbone.hidden_size)),
                         jnp.float32).astype(jnp.bfloat16)
    c0_logits = jnp.asarray(rng.standard_normal((B, Va)), jnp.float32)
    keys = jax.random.split(jax.random.key(7), B)

    dff = jax.jit(
        lambda p, q, lh, lg, k: decode_frame_fused(
            p, q, config, lh, lg, k, 1.0, 50, False
        )
    )
    batched = np.asarray(dff(params, qdec, last_h, c0_logits, keys))
    for b in range(B):
        solo = np.asarray(
            dff(params, qdec, last_h[b : b + 1], c0_logits[b : b + 1],
                keys[b : b + 1])
        )
        match = (batched[b] == solo[0]).all()
        ok &= bool(match)
        if not match:
            print(f"  batch row {b}: MISMATCH "
                  f"{np.sum(batched[b] != solo[0])}/{solo.size}")
    print(f"batched(B=8) rows == solo runs: {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

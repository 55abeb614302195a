#!/usr/bin/env python
"""Continuous-batching serving example.

Runs a :class:`csm_tpu.serving.CSMServer` with the full TPU fast path —
the batched fused int8 decoder kernel + W8A16 int8 backbone — and feeds it
several text requests that arrive at different times, demonstrating
mid-flight admission into freed slots.  Each request's token stream is
identical to a solo run (per-stream RNG), so batching never changes
outputs.

Capability superset of the reference's inference entry point
(``/root/reference/README.md:102-118``), which generates one batch with no
admission or scheduling.

    python examples/serve.py --model path/to/csm-1b --slots 4 \
        --texts "First request." "Second request." "Third request."
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--mimi", default=None)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--texts", nargs="+", required=True)
    ap.add_argument("--out-prefix", default="serve_out")
    ap.add_argument("--no-quant", action="store_true",
                    help="disable the int8 fast paths (pure bf16 XLA)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from csm_tpu.codec import load_mimi
    from csm_tpu.data import CSMProcessor
    from csm_tpu.data.audio_io import save_wav
    from csm_tpu.data.tokenizer import load_llama3_tokenizer
    from csm_tpu.model_api import CSMModel
    from csm_tpu.serving import CSMServer

    print("loading tokenizer / codec / model ...")
    tokenizer = load_llama3_tokenizer()
    mimi = load_mimi(args.mimi, num_codebooks=32)
    model = CSMModel.from_pretrained(args.model, dtype=jnp.bfloat16)
    processor = CSMProcessor(tokenizer, mimi)

    qdec = qbb = qsb = None
    if not args.no_quant and jax.default_backend() != "cpu":
        from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
        from csm_tpu.ops.fused_decoder import prepare_fused_decoder
        from csm_tpu.ops.quant import prepare_quantized_backbone

        print("quantizing fast paths (one-time)...")
        # Past 8 slots the int8 head serves every slot in ONE fused-decoder
        # program (MAX_VALIDATED_B_1SLOT) instead of chunking at 8.
        _hb = 8 if args.slots > 8 else 16
        qdec = jax.jit(
            lambda p: prepare_fused_decoder(p, model.config, head_bits=_hb)
        )(model.params)
        qbb = jax.jit(lambda p: prepare_quantized_backbone(p, model.config))(model.params)
        from csm_tpu.ops.bb_kernel import MAX_VALIDATED_B

        if args.slots <= MAX_VALIDATED_B:
            qsb = jax.jit(
                lambda p: prepare_streamed_backbone(p, model.config)
            )(model.params)

    server = CSMServer(
        model.params, model.config, n_slots=args.slots, window=args.window,
        max_new_frames=args.frames, qdec=qdec, qbb=qbb, qsb=qsb,
    )

    rids = {}
    t0 = time.time()
    for i, text in enumerate(args.texts):
        batch = processor(
            messages=[{"role": "speaker_0",
                       "content": [{"type": "text", "text": text}]}],
            audios=None, amortize_decoder_training=False, return_tensors="np",
        )
        rid = server.submit(batch["input_ids"], batch["attention_mask"],
                            rng=jax.random.key(100 + i))
        rids[rid] = text
        # New requests join while earlier ones are mid-stream.
        server.step()
        print(f"t={time.time()-t0:5.1f}s submitted #{rid}: {text!r} "
              f"(active slots: {server.active_slots})")

    results = server.run_until_idle()
    print(f"all requests drained in {time.time()-t0:.1f}s")

    for rid, frames in sorted(results.items()):
        if frames.shape[0] == 0:
            print(f"#{rid}: empty (stopped immediately)")
            continue
        wave = mimi.decode(np.asarray(frames).T)
        path = f"{args.out_prefix}_{rid}.wav"
        save_wav(path, np.asarray(wave), mimi.sample_rate)
        print(f"#{rid}: {frames.shape[0]} frames "
              f"({frames.shape[0]/12.5:.1f} s) -> {path}")


if __name__ == "__main__":
    main()

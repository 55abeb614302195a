#!/usr/bin/env python
"""End-to-end generation example — the counterpart of the reference README
recipe (``README.md:21-123``): voice cloning from a context clip +
transcript, then synthesizing new text in that voice.

Requires CSM weights (reference-layout safetensors dir or HF hub id) and
Mimi weights (safetensors or network access to kyutai/mimi):

    python examples/generate.py \
        --model path/to/csm-1b --context context.wav \
        --context-text "We have a lot to talk about." \
        --text "This voice is cloned from the context." \
        --out out.wav --frames 125
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--mimi", default=None, help="Mimi safetensors path")
    ap.add_argument("--context", default=None, help="context WAV for voice cloning")
    ap.add_argument("--context-text", default="")
    ap.add_argument("--text", required=True)
    ap.add_argument("--speaker", type=int, default=0)
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stream", action="store_true",
                    help="emit audio incrementally via the serving streamer")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--quantize", action="store_true",
                    help="enable the int8 fast paths (fused decoder + "
                    "streamed backbone kernels; ~3x faster on a v5e)")
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8),
                    help="streamed-backbone weight precision (4 = W4A16 "
                    "int4 tier; with --quantize)")
    ap.add_argument("--head-bits", type=int, default=16, choices=(8, 16),
                    help="fused-decoder audio_head precision (8 = int8 "
                    "head; with --quantize)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from csm_tpu.codec import load_mimi
    from csm_tpu.data import CSMProcessor
    from csm_tpu.data.audio_io import load_audio_mono, save_wav
    from csm_tpu.data.tokenizer import load_llama3_tokenizer
    from csm_tpu.model_api import CSMModel

    print("loading tokenizer / codec / model ...")
    tokenizer = load_llama3_tokenizer()
    mimi = load_mimi(args.mimi, num_codebooks=32)
    model = CSMModel.from_pretrained(
        args.model, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    if args.quantize:
        print("quantizing fast paths (one-time)...")
        model.quantize(bits=args.bits, head_bits=args.head_bits)
    processor = CSMProcessor(tokenizer, mimi)

    role = f"speaker_{args.speaker}"
    messages, audios = [], []
    if args.context:
        wave = load_audio_mono(args.context, mimi.sample_rate)
        messages.append({
            "role": role,
            "content": [{"type": "text", "text": args.context_text},
                        {"type": "audio", "url": args.context}],
        })
        audios.append(wave)
    messages.append({"role": role, "content": [{"type": "text", "text": args.text}]})

    batch = processor(
        messages=messages, audios=audios or None,
        amortize_decoder_training=False, return_tensors="np",
    )

    if args.stream:
        from csm_tpu.serving import CSMStreamer

        streamer = CSMStreamer(
            model.params, model.config, codec=mimi,
            temperature=args.temperature, topk=args.topk,
        )
        chunks = []
        for i, out in enumerate(streamer.run(
            batch["input_ids"], batch["attention_mask"],
            max_new_frames=args.frames, rng=jax.random.key(args.seed),
        )):
            chunks.append(out["audio"][0])
            print(f"\rframe {i + 1}", end="", flush=True)
        print()
        wave = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    else:
        frames = model.generate(
            batch["input_ids"], batch["attention_mask"],
            max_new_frames=args.frames, temperature=args.temperature,
            topk=args.topk, rng=jax.random.key(args.seed),
        )
        print(f"generated {frames.shape[1]} frames "
              f"({frames.shape[1] / 12.5:.1f} s of audio)")
        wave = mimi.decode(frames[0].T)

    save_wav(args.out, wave, mimi.sample_rate)
    print(f"wrote {args.out} ({len(wave) / mimi.sample_rate:.1f} s @ "
          f"{mimi.sample_rate} Hz)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Full-scale end-to-end verification against the published checkpoints.

When network (or a local cache) is available, this script runs the README
recipe (`/root/reference/README.md:21-123`) at REAL scale and proves the
weight-conversion + generation stack end to end:

1. fetch ``thomasgauthier/csm-1b-hf`` (CSM weights) and ``kyutai/mimi``
   (codec weights) from the hub — or use ``--model-path`` / ``--mimi-path``
   local directories;
2. load them through :meth:`csm_tpu.model_api.CSMModel.from_pretrained` and
   :func:`csm_tpu.codec.convert` (the same converters the tiny committed
   fixtures pin down offline, ``tests/fixtures/tiny_golden``);
3. build a prompt with :class:`csm_tpu.data.CSMProcessor`, generate frames
   greedily, and Mimi-decode them to a WAV;
4. if torch + ``/root/reference`` are present, run the SAME prompt through
   the PyTorch reference (uncached oracle loop) and compare greedy tokens
   frame-by-frame — the definitive conversion check at 1B scale.

Zero-egress environments (like the build sandbox) exit early with a clear
message; nothing in the test suite depends on this script.

Usage:
    python scripts/fetch_and_verify.py [--model-path DIR] [--mimi-path DIR]
        [--frames 25] [--out verify_out]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODEL_ID = "thomasgauthier/csm-1b-hf"
MIMI_ID = "kyutai/mimi"


def _fetch(path_or_id: str) -> str:
    if path_or_id and os.path.exists(path_or_id):
        return path_or_id
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(
            path_or_id, allow_patterns=["*.safetensors", "*.json", "*.model"]
        )
    except Exception as e:  # noqa: BLE001
        sys.exit(
            f"cannot fetch {path_or_id!r} ({type(e).__name__}: {e}).\n"
            "This environment appears to have no network access — pass "
            "--model-path/--mimi-path pointing at local copies, or run "
            "where the hub is reachable.  (The offline equivalent of this "
            "check is tests/test_golden_fixtures.py at tiny scale.)"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=MODEL_ID)
    ap.add_argument("--mimi-path", default=MIMI_ID)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--out", default="verify_out")
    ap.add_argument("--text", default="Hello from the TPU build of CSM.")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    import jax

    from csm_tpu.codec import load_mimi
    from csm_tpu.data import CSMProcessor
    from csm_tpu.data.audio_io import save_wav
    from csm_tpu.data.tokenizer import load_llama3_tokenizer
    from csm_tpu.model_api import CSMModel

    model_dir = _fetch(args.model_path)
    mimi_dir = _fetch(args.mimi_path)

    print(f"loading CSM weights from {model_dir} ...")
    model = CSMModel.from_pretrained(model_dir, dtype=jax.numpy.bfloat16)
    print(f"loading Mimi codec from {mimi_dir} ...")
    mimi = load_mimi(num_codebooks=model.config.audio_num_codebooks,
                     path=mimi_dir)
    tokenizer = load_llama3_tokenizer()
    processor = CSMProcessor(tokenizer, mimi)

    messages = [{
        "role": "speaker_0",
        "content": [{"type": "text", "text": args.text}],
    }]
    batch = processor(messages=messages, audios=None, return_tensors="np",
                      amortize_decoder_training=False)
    ids = batch["input_ids"]
    mask = batch["attention_mask"]
    print(f"prompt: {ids.shape[1]} frames; generating {args.frames} greedily...")

    frames = model.generate(
        ids, mask, max_new_frames=args.frames, greedy=True,
        stop_on_all_zeros=True,
    )
    print(f"generated {frames.shape[1]} frames")

    os.makedirs(args.out, exist_ok=True)
    if frames.shape[1] > 0:
        wave = mimi.decode(np.asarray(frames)[0].T)
        wav_path = os.path.join(args.out, "sample.wav")
        save_wav(wav_path, np.asarray(wave), mimi.sample_rate)
        print(f"audio written to {wav_path}")
    np.save(os.path.join(args.out, "tokens.npy"), np.asarray(frames))

    if args.skip_reference:
        return
    try:
        import torch  # noqa: F401

        sys.path.insert(0, os.path.join(REPO, "tests"))
        sys.path.insert(0, "/root/reference")
        import modeling_csm
    except Exception:
        print("torch reference unavailable — skipping token comparison")
        return

    print("running the PyTorch reference on the same prompt (uncached oracle)...")
    import torch

    ref = modeling_csm.CSMModel.from_pretrained(model_dir, torch_dtype=torch.float32)
    ref = ref.eval()
    gi = torch.tensor(np.asarray(ids))
    gm = torch.tensor(np.asarray(mask), dtype=torch.float32)
    ref_frames = []
    for _ in range(frames.shape[1]):
        with torch.no_grad():
            o = ref.generate_frame(input_ids=gi, attention_mask=gm,
                                   temperature=1.0, topk=1,
                                   use_cache=False, return_dict=True)
        f = o.samples
        ref_frames.append(f.numpy())
        row = torch.cat([f, torch.zeros((1, 1), dtype=f.dtype)], dim=1)
        gi = torch.cat([gi, row[:, None, :]], dim=1)
        rm = torch.zeros((1, 1, gi.shape[-1]))
        rm[:, :, :-1] = 1.0
        gm = torch.cat([gm, rm], dim=1)
    ref_frames = np.stack(ref_frames, axis=1)

    agree = (np.asarray(frames) == ref_frames).mean()
    print(f"greedy token agreement vs reference: {agree:.4f}")
    if agree < 0.99:
        sys.exit("FAIL: token agreement below 0.99 — check hf_convert mapping")
    print("PASS")


if __name__ == "__main__":
    main()

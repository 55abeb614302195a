#!/usr/bin/env python
"""Generate committed golden fixtures from the PyTorch reference.

Produces, under ``tests/fixtures/tiny_golden/``:

- ``config.json`` + ``model.safetensors`` — a tiny random-weight CSM
  checkpoint in the REFERENCE key layout (exactly what
  ``thomasgauthier/csm-1b-hf`` ships, at toy scale) — so the full
  ``from_pretrained`` → ``hf_convert`` path is exercised offline;
- ``golden.npz`` — a fixed prompt plus the torch reference's greedy
  generate tokens, forward c0-logits, and losses on that checkpoint.

The paired test (``tests/test_golden_fixtures.py``) loads the checkpoint
through :meth:`csm_tpu.model_api.CSMModel.from_pretrained` and checks
token/logit equality WITHOUT importing torch or /root/reference — catching
any weight-conversion regression even in environments where the reference
is absent.  Run this script only to (re)generate the fixtures; it needs
torch + /root/reference.

Full-scale counterpart: ``scripts/fetch_and_verify.py`` (hub weights).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tests", "fixtures", "tiny_golden")


def main():
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import random_csm_batch, torch_csm_from_config

    from csm_tpu.config import CSMConfig

    os.makedirs(OUT, exist_ok=True)
    cfg = CSMConfig.tiny()
    model = torch_csm_from_config(cfg, seed=7)

    # --- checkpoint in the reference layout -------------------------------
    from safetensors.numpy import save_file

    sd = {
        k: v.detach().cpu().numpy() for k, v in model.state_dict().items()
    }
    save_file(sd, os.path.join(OUT, "model.safetensors"))
    cfg.to_json(os.path.join(OUT, "config.json"))

    # --- golden outputs ----------------------------------------------------
    batch = random_csm_batch(cfg, batch=2, seq=12, seed=21)
    ids = torch.tensor(batch["input_ids"])
    mask = torch.tensor(batch["attention_mask"])
    labels = torch.tensor(batch["labels"])

    with torch.no_grad():
        fwd = model(input_ids=ids, attention_mask=mask.float(), labels=labels)

    # Greedy frames via the reference's UNCACHED full-recompute loop (next
    # input built per modeling_csm.py:675-690).  At tiny random-weight scale
    # torch's cached path drifts from its own uncached path by fp noise
    # (near-tied argmax flips); the uncached oracle is the well-conditioned
    # target — same convention as tests/test_generation_parity.py.
    n_frames = 4
    gi, gm = ids.clone(), mask.float().clone()
    frame_list = []
    for _ in range(n_frames):
        with torch.no_grad():
            o = model.generate_frame(
                input_ids=gi, attention_mask=gm, temperature=1.0, topk=1,
                use_cache=False, return_dict=True,
            )
        f = o.samples
        frame_list.append(f.numpy())
        row = torch.cat([f, torch.zeros((f.shape[0], 1), dtype=f.dtype)], dim=1)
        gi = torch.cat([gi, row[:, None, :]], dim=1)
        rm = torch.zeros((f.shape[0], 1, gi.shape[-1]))
        rm[:, :, :-1] = 1.0
        gm = torch.cat([gm, rm], dim=1)
    frames = torch.tensor(np.stack(frame_list, axis=1))

    np.savez(
        os.path.join(OUT, "golden.npz"),
        input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"],
        labels=batch["labels"],
        c0_logits_last=fwd.logits.numpy(),
        loss=float(fwd.loss),
        backbone_loss=float(fwd.backbone_loss),
        decoder_loss=float(fwd.decoder_loss),
        greedy_frames=frames.numpy(),
    )
    meta = {
        "generator": "scripts/make_golden_fixtures.py",
        "reference": "/root/reference (thomasgauthier/csm-hf)",
        "config": "CSMConfig.tiny()",
        "greedy": "generate(max_new_frames=4, topk=1, stop_on_all_zeros=False)",
    }
    with open(os.path.join(OUT, "README.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"fixtures written to {OUT}")
    print("frames:", frames.shape, "loss:", float(fwd.loss))


if __name__ == "__main__":
    main()

"""Torch reference oracle for parity tests.

Imports the PyTorch reference implementation from ``/root/reference``
(read-only) and instantiates it with tiny random-weight configs on CPU, per
SURVEY §4.1: identical inputs into both frameworks, compare logits/losses and
greedy tokens.  The reference code is *executed* as an oracle, never copied.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np

REFERENCE_PATH = "/root/reference"


def _import_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import modeling_csm  # noqa: F401

    return modeling_csm


def torch_csm_from_config(cfg, seed: int = 0):
    """Build the reference ``CSMModel`` (fp32, CPU, eval mode) shaped like the
    given :class:`csm_tpu.config.CSMConfig`, with seeded random weights."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig

    modeling_csm = _import_reference()

    def hf_llama(c):
        return HFLlamaConfig(
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps,
            attention_dropout=0.0,
            rope_theta=c.rope_theta,
            rope_scaling=(
                {
                    "rope_type": c.rope_scaling.rope_type,
                    "factor": c.rope_scaling.factor,
                    "low_freq_factor": c.rope_scaling.low_freq_factor,
                    "high_freq_factor": c.rope_scaling.high_freq_factor,
                    "original_max_position_embeddings": c.rope_scaling.original_max_position_embeddings,
                }
                if c.rope_scaling is not None
                else None
            ),
            hidden_act="silu",
            attention_bias=False,
            mlp_bias=False,
            tie_word_embeddings=False,
        )

    torch.manual_seed(seed)
    ref_config = modeling_csm.CSMConfig(
        text_vocab_size=cfg.text_vocab_size,
        audio_vocab_size=cfg.audio_vocab_size,
        audio_num_codebooks=cfg.audio_num_codebooks,
        max_seq_len=cfg.max_seq_len,
        backbone_config=hf_llama(cfg.backbone),
        decoder_config=hf_llama(cfg.decoder),
    )
    model = modeling_csm.CSMModel(ref_config)
    # The reference leaves ``audio_head`` as ``torch.empty`` (uninitialized —
    # ``modeling_csm.py:235-240``); give it real values for testing.
    with torch.no_grad():
        model.audio_head.normal_(0.0, 0.02)
    model = model.float().eval()
    return model


def jax_params_from_torch(model, cfg):
    """Reference model state dict → csm_tpu parameter pytree (fp32)."""
    import jax.numpy as jnp

    from csm_tpu.checkpoint import jax_params_from_state_dict

    return jax_params_from_state_dict(model.state_dict(), cfg, dtype=jnp.float32)


def random_csm_batch(
    cfg, batch: int, seq: int, seed: int = 0, audio_run: Tuple[int, int] = None
) -> dict:
    """Synthesize a CSM-shaped ``[B, S, 33]`` batch: leading text frames, a
    run of audio frames, optional left padding, plus labels with -100 rules
    mimicking the processor output (``processor.py:200-378``)."""
    rng = np.random.default_rng(seed)
    N = cfg.audio_num_codebooks
    W = cfg.frame_width
    ids = np.zeros((batch, seq, W), np.int64)
    mask = np.zeros((batch, seq, W), np.int64)
    labels = np.full((batch, seq, W), -100, np.int64)

    for b in range(batch):
        pad = int(rng.integers(0, max(1, seq // 4))) if batch > 1 else 0
        n_text = int(rng.integers(2, max(3, seq // 4)))
        pos = pad
        # text frames
        t_end = min(seq, pos + n_text)
        ids[b, pos:t_end, -1] = rng.integers(1, cfg.text_vocab_size, t_end - pos)
        mask[b, pos:t_end, -1] = 1
        pos = t_end
        # audio frames fill the rest
        if pos < seq:
            ids[b, pos:, :N] = rng.integers(1, cfg.audio_vocab_size, (seq - pos, N))
            mask[b, pos:, :N] = 1
            labels[b, pos:, :N] = ids[b, pos:, :N]
    return {"input_ids": ids, "attention_mask": mask, "labels": labels}

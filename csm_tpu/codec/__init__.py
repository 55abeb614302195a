"""Mimi neural audio codec in JAX (SURVEY §2b "Mimi codec" — the largest
external port).

Mimi maps 24 kHz mono audio ↔ frames of 32 RVQ codebook tokens at 12.5 Hz:
a SEANet causal-conv encoder (stride 960 total) → an 8-layer causal
transformer at 25 Hz → a stride-2 downsample to 12.5 Hz → a split residual
vector quantizer (1 semantic + 31 acoustic codebooks, vocab 2048); the
decoder mirrors it with a transposed-conv upsample.  CSM touch points:
``processor.py:284-287`` (encode) and ``README.md:114-115`` (decode).
"""

from csm_tpu.codec.convert import mimi_params_from_state_dict, random_mimi_params
from csm_tpu.codec.mimi import MimiCodec, MimiCodecConfig, load_mimi

__all__ = [
    "MimiCodec",
    "MimiCodecConfig",
    "load_mimi",
    "mimi_params_from_state_dict",
    "random_mimi_params",
]

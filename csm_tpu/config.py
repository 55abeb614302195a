"""Configuration system for csm_tpu.

Mirrors the reference's two-tier config (``modeling_csm.py:52-143``): a CSM
config holding two nested Llama sub-configs plus the CSM hyper-parameters
(``text_vocab_size=128256``, ``audio_vocab_size=2051``,
``audio_num_codebooks=32``, ``max_seq_len=2048``), JSON-serializable, with a
dict-or-object constructor and the same derived overrides (backbone
``max_position_embeddings`` ← ``max_seq_len``; decoder
``max_position_embeddings`` ← ``audio_num_codebooks``; both vocab sizes ←
``text_vocab_size``).

Implemented as plain frozen dataclasses (hashable, so they can be static
arguments to ``jax.jit``) rather than HF ``PretrainedConfig`` objects.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Mapping, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RopeScalingConfig:
    """Llama-3 long-context RoPE scaling (reference ``modeling_csm.py:79-85``).

    ``rope_type="llama3"`` rescales low-frequency components of the inverse
    frequencies by ``1/factor`` with a smooth ramp between the high/low
    frequency cutoffs, as in HF ``_compute_llama3_parameters``.
    """

    rope_type: str = "llama3"
    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Optional[Mapping[str, Any]]) -> Optional["RopeScalingConfig"]:
        if d is None:
            return None
        d = dict(d)
        # HF serializes the discriminator as either "type" or "rope_type".
        rope_type = d.pop("type", None) or d.pop("rope_type", "llama3")
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(rope_type=rope_type, **{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Shape of one Llama transformer stack.

    Defaults are the CSM backbone: Llama-3.2-1B shape (reference
    ``modeling_csm.py:68-88``) — 16 layers, hidden 2048, FFN 8192, GQA with
    32 query / 8 KV heads, RMSNorm eps 1e-5, SiLU, rope_theta 500000 with
    llama3 scaling.
    """

    vocab_size: int = 128256
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[RopeScalingConfig] = RopeScalingConfig()

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_query_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["rope_scaling"] = self.rope_scaling.to_dict() if self.rope_scaling else None
        return d

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "LlamaConfig":
        d = dict(d)
        scaling = RopeScalingConfig.from_dict(d.pop("rope_scaling", None))
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(rope_scaling=scaling, **{k: v for k, v in d.items() if k in known})


def _default_backbone() -> LlamaConfig:
    return LlamaConfig()


def _default_decoder() -> LlamaConfig:
    # Reference decoder shape: ``modeling_csm.py:89-109`` — 4 layers, hidden
    # 1024, FFN 8192, GQA 8 query / 2 KV heads, same RoPE regime.
    return LlamaConfig(
        hidden_size=1024,
        intermediate_size=8192,
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=32,
    )


@dataclasses.dataclass(frozen=True)
class CSMConfig:
    """Two nested Llama configs + CSM hyper-parameters.

    Construction applies the same forced overrides as the reference
    constructor (``modeling_csm.py:112-143``): both sub-config vocab sizes are
    set to ``text_vocab_size``; backbone ``max_position_embeddings`` is set to
    ``max_seq_len``; decoder ``max_position_embeddings`` is set to
    ``audio_num_codebooks``.

    Note the reference quirk (SURVEY §7 "hard parts"): the decoder is *run*
    with 33 positions during training (frame hidden + 32 codebooks,
    ``modeling_csm.py:432-441``) even though ``max_position_embeddings`` is
    32; the RoPE table must therefore cover ``audio_num_codebooks + 1``
    positions.  :func:`decoder_rope_positions` exposes that bound.
    """

    text_vocab_size: int = 128256
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 32
    max_seq_len: int = 2048
    backbone: LlamaConfig = dataclasses.field(default_factory=_default_backbone)
    decoder: LlamaConfig = dataclasses.field(default_factory=_default_decoder)

    def __post_init__(self):
        # Forced overrides, mirroring ``modeling_csm.py:128-141``.
        object.__setattr__(
            self,
            "backbone",
            dataclasses.replace(
                self.backbone,
                vocab_size=self.text_vocab_size,
                max_position_embeddings=self.max_seq_len,
            ),
        )
        object.__setattr__(
            self,
            "decoder",
            dataclasses.replace(
                self.decoder,
                vocab_size=self.text_vocab_size,
                max_position_embeddings=self.audio_num_codebooks,
            ),
        )

    # -- derived quantities -------------------------------------------------

    @property
    def frame_width(self) -> int:
        """Tokens per frame: 32 audio codebooks + 1 text column = 33."""
        return self.audio_num_codebooks + 1

    @property
    def audio_embedding_rows(self) -> int:
        """Shared audio embedding table height: 32 × 2051 = 65632
        (reference ``modeling_csm.py:222-225``)."""
        return self.audio_vocab_size * self.audio_num_codebooks

    @property
    def decoder_rope_positions(self) -> int:
        """RoPE table length needed by the decoder: 33 (positions 0..32 are
        exercised by the training forward, ``modeling_csm.py:432-441``)."""
        return self.audio_num_codebooks + 1

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "model_type": "csm",
            "text_vocab_size": self.text_vocab_size,
            "audio_vocab_size": self.audio_vocab_size,
            "audio_num_codebooks": self.audio_num_codebooks,
            "max_seq_len": self.max_seq_len,
            "backbone_config": self.backbone.to_dict(),
            "decoder_config": self.decoder.to_dict(),
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CSMConfig":
        d = dict(d)
        backbone = d.get("backbone_config") or d.get("backbone")
        decoder = d.get("decoder_config") or d.get("decoder")
        kwargs = {}
        for k in ("text_vocab_size", "audio_vocab_size", "audio_num_codebooks", "max_seq_len"):
            if k in d:
                kwargs[k] = d[k]
        return cls(
            backbone=LlamaConfig.from_dict(backbone) if backbone else _default_backbone(),
            decoder=LlamaConfig.from_dict(decoder) if decoder else _default_decoder(),
            **kwargs,
        )

    def to_json(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.to_dict(), indent=2)
        if path is not None:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str: str) -> "CSMConfig":
        if path_or_str.lstrip().startswith("{"):
            return cls.from_dict(json.loads(path_or_str))
        with open(path_or_str) as f:
            return cls.from_dict(json.load(f))

    # -- test helpers -------------------------------------------------------

    @classmethod
    def tiny(cls, **overrides) -> "CSMConfig":
        """A miniature config for unit/parity tests: same structure, tiny
        shapes.  Keeps GQA (2 KV groups) so grouped attention is exercised."""
        kwargs = dict(
            text_vocab_size=97,
            audio_vocab_size=23,
            audio_num_codebooks=32,
            max_seq_len=64,
            backbone=LlamaConfig(
                hidden_size=64,
                intermediate_size=128,
                num_hidden_layers=2,
                num_attention_heads=4,
                num_key_value_heads=2,
                max_position_embeddings=64,
            ),
            decoder=LlamaConfig(
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=2,
                num_attention_heads=2,
                num_key_value_heads=1,
                max_position_embeddings=32,
            ),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

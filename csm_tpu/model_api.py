"""Class-style model API: a drop-in-familiar ``CSMModel`` over the
functional core.

The reference exposes ``CSMModel(PreTrainedModel)`` with ``forward`` /
``generate_frame`` / ``generate`` / ``setup_caches`` / ``from_pretrained``
(``modeling_csm.py:192-702``).  This wrapper provides the same surface on
top of the functional pytree implementation so reference users can switch
with minimal edits; the functional API (:mod:`csm_tpu.models.csm`,
:mod:`csm_tpu.generation`) remains the primary interface for training and
custom jit pipelines.

Checkpoint format: a directory with ``config.json`` (reference-compatible
CSM config) and ``model.safetensors`` in the reference's key layout — files
written by ``save_pretrained`` load in the PyTorch reference and vice versa.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.config import CSMConfig
from csm_tpu.models import csm
from csm_tpu.models.csm import CSMOutput


class CSMModel:
    """Stateful convenience wrapper: holds ``(config, params)`` and jits the
    forward/generation paths per input shape."""

    def __init__(self, config: CSMConfig, params: Optional[dict] = None,
                 dtype=jnp.float32, seed: int = 0):
        self.config = config
        self.dtype = dtype
        if params is None:
            params = csm.init_params(jax.random.key(seed), config, dtype)
        self.params = params
        self._using_kv_cache = False
        self._qdec = self._qbb = self._qsb = None
        self._specdec = False
        self._fwd = jax.jit(
            lambda p, ids, mask, labels, k: csm.forward(
                p, config, ids, mask, labels=labels, max_decoder_frames=k
            ),
            static_argnames=("k",),
        )
        # Built once: building a fresh jax.jit per call would re-trace and
        # recompile on EVERY forward() even at identical shapes.
        self._fwd_nolabels = jax.jit(
            lambda p, ids, mask: csm.forward(p, config, ids, mask)
        )

    # -- reference API ------------------------------------------------------

    def setup_caches(self, max_batch_size: int) -> None:
        """Enable KV caching shim (``modeling_csm.py:284-287``); generation
        here always builds its own static cache."""
        self._using_kv_cache = True

    def reset_caches(self) -> None:
        """No-op shim (``modeling_csm.py:289-290``)."""

    def forward(self, input_ids, attention_mask=None, labels=None,
                max_decoder_frames: Optional[int] = None,
                return_dict: Optional[bool] = None,
                output_attentions=None, output_hidden_states=None,
                **_ignored):
        """Reference-compatible forward (``modeling_csm.py:292-482``).

        ``return_dict=False`` returns the reference's tuple form
        ``(loss?, last_hidden_state, logits)`` (``modeling_csm.py:467-473``;
        the cache element is omitted — this wrapper's forward never carries
        a cache, matching ``use_cache=False``).  ``output_attentions`` /
        ``output_hidden_states`` are accepted and inert — behaviorally
        identical to the reference, which forwards them into the HF
        backbone and then discards the extra outputs (``CSMOutput`` has no
        fields for them, ``modeling_csm.py:345-354, 475-482``).
        """
        del output_attentions, output_hidden_states  # reference-inert
        ids = jnp.asarray(input_ids)
        mask = (
            jnp.asarray(attention_mask, jnp.float32)
            if attention_mask is not None
            else jnp.ones(ids.shape, jnp.float32)
        )
        lbl = jnp.asarray(labels) if labels is not None else None
        k = max_decoder_frames
        if lbl is not None and k is None:
            k = int(ids.shape[0] * ids.shape[1])
        if lbl is None:
            out = self._fwd_nolabels(self.params, ids, mask)
        else:
            out = self._fwd(self.params, ids, mask, lbl, k)
        if return_dict is False:
            tup = (out.last_hidden_state, out.logits)
            if out.loss is not None:
                tup = (out.loss,) + tup
            return tup
        return out

    __call__ = forward

    def generate_frame(self, input_ids, attention_mask, temperature: float = 1.0,
                       topk: int = 50, rng: Optional[jax.Array] = None,
                       greedy: bool = False, **_ignored) -> CSMOutput:
        from csm_tpu import generation

        return generation.generate_frame(
            self.params, self.config,
            jnp.asarray(input_ids), jnp.asarray(attention_mask, jnp.float32),
            temperature=temperature, topk=topk, rng=rng, greedy=greedy,
        )

    def quantize(self, bits: int = 8, head_bits: int = 16) -> "CSMModel":
        """Prepare the opt-in quantized fast paths once (fused decoder
        kernel, W8A16 backbone, streamed-weight backbone kernel — see
        ``docs/ARCHITECTURE.md``); subsequent :meth:`generate` calls use
        them automatically.  ``bits=4`` stores the streamed backbone
        kernel's layer weights as W4A16 int4 with exact row equilibration —
        roughly halves the backbone decode step again at a further (small)
        weight-precision cost; the fused decoder and the c0 head stay
        int8.  ``head_bits=8`` also quantizes the fused decoder's per-step
        ``audio_head`` slices to int8, halving each chunk's head-slice DMA
        traffic (batches past 8 rows chunk either way — a single B=16
        program exceeds this backend's scoped-VMEM limit).  Single-chip TPU paths: call only when
        the default backend is a TPU and generation runs un-meshed.
        Returns ``self`` for chaining."""
        from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
        from csm_tpu.ops.fused_decoder import prepare_fused_decoder
        from csm_tpu.ops.quant import prepare_quantized_backbone

        cfg = self.config
        self._qdec = jax.jit(
            lambda p: prepare_fused_decoder(p, cfg, head_bits=head_bits)
        )(self.params)
        self._qbb = jax.jit(lambda p: prepare_quantized_backbone(p, cfg))(self.params)
        self._qsb = jax.jit(
            lambda p: prepare_streamed_backbone(p, cfg, bits=bits)
        )(self.params)
        self._specdec = False
        return self

    def exact(self) -> "CSMModel":
        """Prepare the EXACT fast tier: same tokens as the plain bf16 path,
        ~3x its single-stream speed.  The backbone decode step rides the
        streamed bf16 kernel (``ops.bb_kernel`` bits=16 — same weight
        values, same rounding points as the XLA path), and the intra-frame
        codebook loop runs speculative decode (``ops.specdec``): the int8
        fused kernel only DRAFTS, one teacher-forced bf16 XLA pass per
        round verifies, so every emitted token is arbitrated by a
        teacher-forced bf16 pass (parity up to last-ulp accumulation ties
        between the teacher-forced and incremental programs; gated at 100%
        token agreement on sharpened logits — KERNEL_CHECKS
        trained_agreement).
        Returns ``self`` for chaining.  Mutually exclusive with
        :meth:`quantize` (the later call wins)."""
        from csm_tpu.ops.bb_kernel import prepare_streamed_backbone
        from csm_tpu.ops.fused_decoder import prepare_fused_decoder

        cfg = self.config
        self._qdec = jax.jit(
            lambda p: prepare_fused_decoder(p, cfg, head_bits=8)
        )(self.params)
        self._qbb = None  # W8A16 XLA layers would break exactness
        self._qsb = jax.jit(
            lambda p: prepare_streamed_backbone(p, cfg, bits=16)
        )(self.params)
        self._specdec = True
        return self

    def generate(self, input_ids, attention_mask, max_new_frames: int = 100,
                 temperature: float = 1.0, topk: int = 50, use_cache: bool = True,
                 stop_on_all_zeros: bool = True, rng: Optional[jax.Array] = None,
                 greedy: bool = False, stop_mode: str = "batch") -> np.ndarray:
        from csm_tpu import generation

        from csm_tpu.ops import bb_kernel, fused_decoder

        B = np.asarray(input_ids).shape[0]
        qsb_cap = (
            bb_kernel.MAX_VALIDATED_B_EXACT
            if self._specdec
            else bb_kernel.MAX_VALIDATED_B
        )
        return generation.generate(
            self.params, self.config, input_ids, attention_mask,
            max_new_frames=max_new_frames, temperature=temperature, topk=topk,
            use_cache=use_cache, stop_on_all_zeros=stop_on_all_zeros,
            rng=rng, greedy=greedy, stop_mode=stop_mode,
            qdec=self._qdec if B <= fused_decoder.MAX_CHUNKED_B else None,
            qbb=self._qbb,
            qsb=self._qsb if B <= qsb_cap else None,
            specdec=self._specdec,
        )

    # -- persistence --------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32) -> "CSMModel":
        """Load from a directory with ``config.json`` + safetensors in the
        reference layout (works on checkpoints saved by the PyTorch
        reference or by :meth:`save_pretrained`).  A non-local path is
        treated as an HF hub id (e.g. ``thomasgauthier/csm-1b-hf``,
        ``train.py:241-243``) and fetched via ``huggingface_hub``."""
        from csm_tpu.checkpoint import load_params_from_safetensors

        if not os.path.exists(path):
            from huggingface_hub import snapshot_download

            path = snapshot_download(path, allow_patterns=["*.safetensors", "*.json"])
        cfg_path = os.path.join(path, "config.json")
        config = CSMConfig.from_json(cfg_path) if os.path.exists(cfg_path) else CSMConfig()
        params = load_params_from_safetensors(path, config, dtype=dtype)
        return cls(config, params, dtype=dtype)

    def save_pretrained(self, path: str) -> None:
        from csm_tpu.checkpoint.hf_convert import save_params_to_safetensors

        os.makedirs(path, exist_ok=True)
        self.config.to_json(os.path.join(path, "config.json"))
        save_params_to_safetensors(os.path.join(path, "model.safetensors"), self.params)

"""csm_tpu — a TPU-native (JAX / XLA / Pallas / pjit) conversational speech
model framework with the capabilities of thomasgauthier/csm-hf.

CSM is a two-stage autoregressive speech generator (reference:
``modeling_csm.py:1-19``): a Llama-3.2-1B-shaped *backbone* predicts the
semantic Mimi codebook (c0) for each 80 ms audio frame, and a tiny 4-layer
Llama *decoder* autoregressively emits the 31 acoustic codebooks within the
frame.  This package re-designs that stack TPU-first: functional parameter
pytrees, static shapes, ``lax.scan``/``while_loop`` decode loops compiled
into single XLA programs, a ``jax.sharding.Mesh`` threaded through training,
and Pallas kernels on the hot paths.

Public surface (mirrors the reference's API at
``modeling_csm.py``/``processor.py``/``train.py``):

- :class:`csm_tpu.config.CSMConfig` — two nested Llama sub-configs + CSM
  hyper-parameters, JSON round-trip.
- :mod:`csm_tpu.models.csm` — ``init_params`` / ``forward`` (losses) and the
  :class:`CSMOutput` result structure.
- :mod:`csm_tpu.generation` — ``generate_frame`` / ``generate`` with KV-cached
  backbone decode, top-k (Gumbel) sampling, stop-on-all-zeros.
- :mod:`csm_tpu.data.processor` — ``CSMProcessor``: interleaved text+audio
  framing into ``[B, S, 33]`` with labels and decoder amortization.
- :mod:`csm_tpu.train` — pjit DP×SP×TP training loop (optax + orbax; the
  flash-attention VJP + remat fit full-context 1B fine-tuning on one
  16 GB chip), LoRA adapters (:mod:`csm_tpu.train.lora`).
- :mod:`csm_tpu.codec` — Mimi RVQ codec (encode/decode + exact streaming)
  in JAX.
- :mod:`csm_tpu.checkpoint` — HF/torch state-dict ⇄ JAX pytree converters,
  orbax save/load.
- :mod:`csm_tpu.serving` — frame streamer + continuous-batching
  :class:`CSMServer` (mid-flight admission, per-stream RNG, per-request
  temperature/topk/greedy as dynamic per-row inputs, prefix caching with
  stackable contexts, cancel, stats).
- :mod:`csm_tpu.ops.fused_decoder` / :mod:`csm_tpu.ops.quant` /
  :mod:`csm_tpu.ops.bb_kernel` — the VMEM-resident int8 intra-frame
  decoder kernel (whole-frame sampling in one Pallas call), the W8A16 int8
  XLA backbone path, and the streamed-weight backbone decode kernel
  (``prepare_fused_decoder`` / ``prepare_quantized_backbone`` /
  ``prepare_streamed_backbone`` bundles passed to ``generate``/
  ``CSMServer`` as ``qdec=``/``qbb=``/``qsb=``; or just
  ``CSMModel.quantize()``).
"""

from csm_tpu.config import CSMConfig, LlamaConfig

__version__ = "0.5.0"

__all__ = [
    "CSMConfig", "LlamaConfig", "CSMModel", "CSMServer", "CSMStreamer",
    "__version__",
]

_LAZY = {
    "CSMModel": ("csm_tpu.model_api", "CSMModel"),
    "CSMServer": ("csm_tpu.serving", "CSMServer"),
    "CSMStreamer": ("csm_tpu.serving", "CSMStreamer"),
}


def __getattr__(name):
    # Lazy: importing these pulls in jax-heavy modules.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)

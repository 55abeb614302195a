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
- :mod:`csm_tpu.train` — pjit data-parallel training loop (optax + orbax).
- :mod:`csm_tpu.codec` — Mimi RVQ codec (encode/decode) in JAX.
- :mod:`csm_tpu.checkpoint` — HF/torch state-dict ⇄ JAX pytree converters,
  orbax save/load.
"""

from csm_tpu.config import CSMConfig, LlamaConfig

__version__ = "0.1.0"

__all__ = ["CSMConfig", "LlamaConfig", "CSMModel", "__version__"]


def __getattr__(name):
    # Lazy: importing the class API pulls in jax-heavy modules.
    if name == "CSMModel":
        from csm_tpu.model_api import CSMModel

        return CSMModel
    raise AttributeError(name)

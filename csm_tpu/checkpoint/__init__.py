"""Checkpointing: HF/torch state-dict ⇄ JAX pytree conversion and orbax
native save/load (SURVEY §5 checkpoint/resume, §7 step 3)."""

from csm_tpu.checkpoint.hf_convert import (
    jax_params_from_state_dict,
    load_params_from_safetensors,
)
from csm_tpu.checkpoint.orbax_io import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "jax_params_from_state_dict",
    "load_params_from_safetensors",
    "save_checkpoint",
    "load_checkpoint",
    "latest_step",
]

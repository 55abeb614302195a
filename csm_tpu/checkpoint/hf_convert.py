"""HF-safetensors / torch state-dict → JAX parameter pytree converter.

The published checkpoint ``thomasgauthier/csm-1b-hf`` (``train.py:241-243``,
``README.md:73``) is an HF ``PreTrainedModel`` safetensors file whose keys
follow the reference module tree (``modeling_csm.py:214-245``):

    backbone.layers.{i}.self_attn.{q,k,v,o}_proj.weight
    backbone.layers.{i}.mlp.{gate,up,down}_proj.weight
    backbone.layers.{i}.input_layernorm.weight / post_attention_layernorm.weight
    backbone.norm.weight
    decoder.*                  (same scheme, 4 layers)
    text_embeddings.weight     [128256, 2048]
    audio_embeddings.weight    [65632, 2048]
    projection.weight          [1024, 2048]   (torch [out, in])
    codebook0_head.weight      [2051, 2048]   (torch [out, in])
    audio_head                 [31, 1024, 2051]

This converter maps those to the csm_tpu layout: per-stack layer weights
**stacked** on a leading layer axis and linear weights transposed to
input-major ``[in, out]`` (see :func:`csm_tpu.models.llama.init_params`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from csm_tpu.config import CSMConfig, LlamaConfig


def _to_numpy(x) -> np.ndarray:
    """Accept numpy arrays or torch tensors without importing torch."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch.Tensor
        t = x.detach().cpu()
        # bfloat16 has no numpy dtype — round-trip via float32.
        if str(t.dtype) == "torch.bfloat16":
            return t.float().numpy()
        return t.numpy()
    return np.asarray(x)


def _stack_llama(
    sd: Mapping[str, np.ndarray], prefix: str, config: LlamaConfig, dtype
) -> dict:
    """Collect one Llama stack's per-layer weights into stacked arrays."""
    L = config.num_hidden_layers

    def layer(i: int, name: str) -> np.ndarray:
        return _to_numpy(sd[f"{prefix}.layers.{i}.{name}.weight"])

    def stacked_linear(name: str) -> jnp.ndarray:
        # torch Linear stores [out, in]; transpose each layer to [in, out].
        return jnp.asarray(
            np.stack([layer(i, name).T for i in range(L)]), dtype=dtype
        )

    def stacked_norm(name: str) -> jnp.ndarray:
        return jnp.asarray(np.stack([layer(i, name) for i in range(L)]), dtype=dtype)

    return {
        "layers": {
            "attn_norm": stacked_norm("input_layernorm"),
            "wq": stacked_linear("self_attn.q_proj"),
            "wk": stacked_linear("self_attn.k_proj"),
            "wv": stacked_linear("self_attn.v_proj"),
            "wo": stacked_linear("self_attn.o_proj"),
            "mlp_norm": stacked_norm("post_attention_layernorm"),
            "w_gate": stacked_linear("mlp.gate_proj"),
            "w_up": stacked_linear("mlp.up_proj"),
            "w_down": stacked_linear("mlp.down_proj"),
        },
        "final_norm": jnp.asarray(_to_numpy(sd[f"{prefix}.norm.weight"]), dtype=dtype),
    }


def jax_params_from_state_dict(
    state_dict: Mapping[str, np.ndarray], config: CSMConfig, dtype=jnp.float32
) -> dict:
    """Convert a reference-layout state dict (numpy or torch tensors) to the
    csm_tpu parameter pytree."""
    sd = state_dict
    return {
        "backbone": _stack_llama(sd, "backbone", config.backbone, dtype),
        "decoder": _stack_llama(sd, "decoder", config.decoder, dtype),
        "text_embeddings": jnp.asarray(_to_numpy(sd["text_embeddings.weight"]), dtype=dtype),
        "audio_embeddings": jnp.asarray(_to_numpy(sd["audio_embeddings.weight"]), dtype=dtype),
        "projection": jnp.asarray(_to_numpy(sd["projection.weight"]).T, dtype=dtype),
        "codebook0_head": jnp.asarray(_to_numpy(sd["codebook0_head.weight"]).T, dtype=dtype),
        "audio_head": jnp.asarray(_to_numpy(sd["audio_head"]), dtype=dtype),
    }


def _unstack_llama(params: dict, prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_stack_llama`: stacked JAX stacks → reference keys."""
    out: Dict[str, np.ndarray] = {}
    lp = params["layers"]
    L = lp["attn_norm"].shape[0]
    linear = {
        "self_attn.q_proj": "wq",
        "self_attn.k_proj": "wk",
        "self_attn.v_proj": "wv",
        "self_attn.o_proj": "wo",
        "mlp.gate_proj": "w_gate",
        "mlp.up_proj": "w_up",
        "mlp.down_proj": "w_down",
    }
    norms = {"input_layernorm": "attn_norm", "post_attention_layernorm": "mlp_norm"}
    for i in range(L):
        for hf, ours in linear.items():
            # ascontiguousarray: safetensors silently ignores strides on
            # transposed views, writing the raw buffer instead.
            out[f"{prefix}.layers.{i}.{hf}.weight"] = np.ascontiguousarray(
                np.asarray(lp[ours][i]).T
            )
        for hf, ours in norms.items():
            out[f"{prefix}.layers.{i}.{hf}.weight"] = np.asarray(lp[ours][i])
    out[f"{prefix}.norm.weight"] = np.asarray(params["final_norm"])
    return out


def state_dict_from_jax_params(params: dict) -> Dict[str, np.ndarray]:
    """csm_tpu parameter pytree → reference-layout state dict (numpy).

    Enables round-tripping checkpoints back to the PyTorch reference
    (``save_pretrained`` writes this layout as safetensors).
    """
    sd: Dict[str, np.ndarray] = {}
    sd.update(_unstack_llama(params["backbone"], "backbone"))
    sd.update(_unstack_llama(params["decoder"], "decoder"))
    sd["text_embeddings.weight"] = np.asarray(params["text_embeddings"])
    sd["audio_embeddings.weight"] = np.asarray(params["audio_embeddings"])
    sd["projection.weight"] = np.ascontiguousarray(np.asarray(params["projection"]).T)
    sd["codebook0_head.weight"] = np.ascontiguousarray(
        np.asarray(params["codebook0_head"]).T
    )
    sd["audio_head"] = np.asarray(params["audio_head"])
    return sd


def save_params_to_safetensors(path: str, params: dict) -> None:
    """Write params as a reference-layout ``.safetensors`` file."""
    from safetensors.numpy import save_file

    save_file(state_dict_from_jax_params(params), path)


def load_params_from_safetensors(
    path: str, config: CSMConfig, dtype=jnp.float32
) -> dict:
    """Load the reference checkpoint file(s) and convert.

    ``path`` may be a single ``.safetensors`` file or a directory containing
    sharded ``model-*.safetensors`` files.
    """
    import os

    from safetensors.numpy import load_file

    sd: Dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors")
        )
        if not files:
            raise FileNotFoundError(f"no .safetensors files in {path}")
        for f in files:
            sd.update(load_file(os.path.join(path, f)))
    else:
        sd = load_file(path)
    return jax_params_from_state_dict(sd, config, dtype)

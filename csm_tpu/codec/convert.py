"""HF ``MimiModel`` state dict → csm_tpu Mimi parameter pytree.

Key layout notes:
- SEANet stacks are ``nn.ModuleList``s whose indices include the ELU
  modules; the layer plan in :mod:`csm_tpu.codec.mimi` reproduces the same
  ordering, so conversion walks plan entries and HF indices in lockstep.
- Residual blocks store convs at ``block.1`` and ``block.3`` (0/2 are ELUs).
- Codebook centroids are EMA state: ``embed = embed_sum /
  clamp(cluster_usage, eps)`` (HF ``MimiEuclideanCodebook.embed``).
- Linear/1×1-conv projections are transposed to input-major; conv kernels
  keep the torch ``OIH`` layout; transposed-conv kernels keep torch
  ``[in, out/groups, k]``.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from csm_tpu.codec.mimi import (
    MimiCodecConfig,
    decoder_plan,
    downsample_spec,
    encoder_plan,
    upsample_spec,
)


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):
        t = x.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            return t.float().numpy()
        return t.numpy()
    return np.asarray(x)


def _convert_seanet(sd: Mapping, prefix: str, plan, dtype) -> list:
    params = []
    for hf_idx, item in enumerate(plan):
        kind = item[0]
        if kind == "elu":
            params.append({})
        elif kind == "conv":
            base = f"{prefix}.layers.{hf_idx}.conv"
            p = {"w": jnp.asarray(_np(sd[f"{base}.weight"]), dtype)}
            if f"{base}.bias" in sd:
                p["b"] = jnp.asarray(_np(sd[f"{base}.bias"]), dtype)
            params.append(p)
        elif kind == "resnet":
            block = []
            for bi in (1, 3):  # block indices of the two convs
                base = f"{prefix}.layers.{hf_idx}.block.{bi}.conv"
                cp = {"w": jnp.asarray(_np(sd[f"{base}.weight"]), dtype)}
                if f"{base}.bias" in sd:
                    cp["b"] = jnp.asarray(_np(sd[f"{base}.bias"]), dtype)
                block.append(cp)
            params.append({"block": block})
        else:  # pragma: no cover
            raise ValueError(kind)
    return params


def _convert_transformer(sd: Mapping, prefix: str, cfg: MimiCodecConfig, dtype) -> dict:
    L = cfg.num_hidden_layers

    def lin(i, name):
        return _np(sd[f"{prefix}.layers.{i}.{name}.weight"]).T

    def vec(i, name):
        return _np(sd[f"{prefix}.layers.{i}.{name}"])

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]), dtype)

    return {
        "layers": {
            "ln1_w": stack(lambda i: vec(i, "input_layernorm.weight")),
            "ln1_b": stack(lambda i: vec(i, "input_layernorm.bias")),
            "wq": stack(lambda i: lin(i, "self_attn.q_proj")),
            "wk": stack(lambda i: lin(i, "self_attn.k_proj")),
            "wv": stack(lambda i: lin(i, "self_attn.v_proj")),
            "wo": stack(lambda i: lin(i, "self_attn.o_proj")),
            "scale_attn": stack(lambda i: vec(i, "self_attn_layer_scale.scale")),
            "ln2_w": stack(lambda i: vec(i, "post_attention_layernorm.weight")),
            "ln2_b": stack(lambda i: vec(i, "post_attention_layernorm.bias")),
            "fc1": stack(lambda i: lin(i, "mlp.fc1")),
            "fc2": stack(lambda i: lin(i, "mlp.fc2")),
            "scale_mlp": stack(lambda i: vec(i, "mlp_layer_scale.scale")),
        }
    }


def _convert_rvq(sd: Mapping, prefix: str, n_quantizers: int, dtype, eps=1e-5) -> dict:
    embeds = []
    for i in range(n_quantizers):
        base = f"{prefix}.layers.{i}.codebook"
        embed_sum = _np(sd[f"{base}.embed_sum"])
        usage = _np(sd[f"{base}.cluster_usage"])
        embeds.append(embed_sum / np.clip(usage, eps, None)[:, None])
    return {
        "codebooks": jnp.asarray(np.stack(embeds), dtype),
        # 1×1 convs [out, in, 1] → input-major matrices [in, out]
        "input_proj": jnp.asarray(_np(sd[f"{prefix}.input_proj.weight"])[:, :, 0].T, dtype),
        "output_proj": jnp.asarray(_np(sd[f"{prefix}.output_proj.weight"])[:, :, 0].T, dtype),
    }


def random_mimi_params(
    cfg: MimiCodecConfig, seed: int = 0, dtype=jnp.float32
) -> dict:
    """Random-init Mimi parameter pytree, shape-identical to the output of
    :func:`mimi_params_from_state_dict`.

    Used by the codec benchmarks (``bench.py`` / ``scripts/check_codec_hw.py``)
    to measure full-published-size encode/decode cost on the chip without the
    HF torch model: codec compute time is weight-value-independent, so random
    weights give the true performance numbers even before real
    ``kyutai/mimi`` weights are reachable (``/root/reference/train.py:363-366``
    loads them from the hub).  Layer-scale / norm parameters get their real
    init values so activations stay finite.
    """
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    def seanet(plan):
        out = []
        for item in plan:
            kind = item[0]
            if kind == "elu":
                out.append({})
            elif kind == "conv":
                s = item[1]
                if s.transposed:  # torch ConvTranspose layout [in, out/g, k]
                    w = t(s.in_ch, s.out_ch // s.groups, s.kernel)
                else:  # torch Conv (OIH) layout [out, in/g, k]
                    w = t(s.out_ch, s.in_ch // s.groups, s.kernel)
                p = {"w": w}
                if s.bias:
                    p["b"] = t(s.out_ch)
                out.append(p)
            else:  # resnet: two grouped=1 convs
                out.append({
                    "block": [
                        {"w": t(s.out_ch, s.in_ch, s.kernel), "b": t(s.out_ch)}
                        for s in item[1]
                    ]
                })
        return out

    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def transformer():
        return {
            "layers": {
                "ln1_w": jnp.ones((L, H), dtype),
                "ln1_b": t(L, H),
                "wq": t(L, H, nh * hd),
                "wk": t(L, H, nkv * hd),
                "wv": t(L, H, nkv * hd),
                "wo": t(L, nh * hd, H),
                "scale_attn": jnp.full(
                    (L, H), cfg.layer_scale_initial_scale, dtype
                ),
                "ln2_w": jnp.ones((L, H), dtype),
                "ln2_b": t(L, H),
                "fc1": t(L, H, I),
                "fc2": t(L, I, H),
                "scale_mlp": jnp.full(
                    (L, H), cfg.layer_scale_initial_scale, dtype
                ),
            }
        }

    def rvq(n):
        return {
            "codebooks": t(n, cfg.codebook_size, cfg.codebook_dim, scale=1.0),
            "input_proj": t(H, cfg.codebook_dim),
            "output_proj": t(cfg.codebook_dim, H),
        }

    ds, us = downsample_spec(cfg), upsample_spec(cfg)
    return {
        "encoder": seanet(encoder_plan(cfg)),
        "encoder_transformer": transformer(),
        "downsample": {"w": t(ds.out_ch, ds.in_ch, ds.kernel)},
        "quantizer": {
            "semantic": rvq(cfg.num_semantic_quantizers),
            "acoustic": rvq(cfg.num_quantizers - cfg.num_semantic_quantizers),
        },
        "upsample": {"w": t(us.in_ch, us.out_ch // us.groups, us.kernel)},
        "decoder_transformer": transformer(),
        "decoder": seanet(decoder_plan(cfg)),
    }


def mimi_params_from_state_dict(
    state_dict: Mapping, cfg: MimiCodecConfig, dtype=jnp.float32
) -> dict:
    sd = state_dict
    return {
        "encoder": _convert_seanet(sd, "encoder", encoder_plan(cfg), dtype),
        "encoder_transformer": _convert_transformer(sd, "encoder_transformer", cfg, dtype),
        "downsample": {"w": jnp.asarray(_np(sd["downsample.conv.weight"]), dtype)},
        "quantizer": {
            "semantic": _convert_rvq(
                sd, "quantizer.semantic_residual_vector_quantizer",
                cfg.num_semantic_quantizers, dtype,
            ),
            "acoustic": _convert_rvq(
                sd, "quantizer.acoustic_residual_vector_quantizer",
                cfg.num_quantizers - cfg.num_semantic_quantizers, dtype,
            ),
        },
        "upsample": {"w": jnp.asarray(_np(sd["upsample.conv.weight"]), dtype)},
        "decoder_transformer": _convert_transformer(sd, "decoder_transformer", cfg, dtype),
        "decoder": _convert_seanet(sd, "decoder", decoder_plan(cfg), dtype),
    }

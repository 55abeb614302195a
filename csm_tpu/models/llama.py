"""Functional Llama transformer stack for TPU.

One parametric module instantiated twice by CSM (SURVEY §7 step 1): the
backbone (16L / 2048h / 32Q-8KV heads) and the intra-frame decoder
(4L / 1024h / 8Q-2KV heads).  Behavior matches HF ``LlamaModel`` as used by
the reference (``modeling_csm.py:156-167``, with ``embed_tokens`` replaced by
identity — callers always feed ``inputs_embeds``):

- RMSNorm (eps 1e-5, fp32 accumulation),
- GQA attention with llama3-scaled RoPE (:mod:`csm_tpu.ops.rope`),
- SiLU-gated MLP, no biases anywhere,
- pre-norm residual blocks + final norm.

TPU-first design choices:

- **Parameters are stacked across layers** (leading axis ``L``) and the
  forward pass is a single ``lax.scan`` over layers — one compiled loop body
  instead of ``L`` unrolled blocks.
- **The KV cache is a static-shape ring of arrays** ``[L, B, max_len, kv_heads,
  head_dim]`` with an explicit write index and a per-position validity mask;
  decode attends over the full (static) window under that mask.  This is the
  static-shape replacement for HF ``DynamicCache``
  (``modeling_csm.py:284-290``).
- Softmax and norm accumulate in fp32; matmuls run in the parameter dtype
  with fp32 preferred accumulation (MXU-friendly bf16 weights).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import struct

from csm_tpu.config import LlamaConfig
from csm_tpu.ops.rope import apply_rope, compute_rope_table

# Large negative (finite) attention bias: finite so fully-masked rows softmax
# to uniform instead of NaN (matching HF's min-dtype masking behavior).
NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: LlamaConfig, dtype=jnp.float32) -> dict:
    """Initialize stacked Llama parameters.

    Linear weights ~ N(0, 0.02) (HF ``initializer_range`` default), norms = 1.
    All linear weights are stored **input-major** ``[in, out]`` (transposed
    from torch's ``[out, in]``) so forward matmuls need no transpose.
    """
    L = config.num_hidden_layers
    D = config.hidden_size
    F = config.intermediate_size
    hd = config.head_dim
    nq, nkv = config.num_attention_heads, config.num_key_value_heads

    keys = jax.random.split(key, 7)

    def normal(k, shape):
        return (0.02 * jax.random.normal(k, shape, jnp.float32)).astype(dtype)

    return {
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "wq": normal(keys[0], (L, D, nq * hd)),
            "wk": normal(keys[1], (L, D, nkv * hd)),
            "wv": normal(keys[2], (L, D, nkv * hd)),
            "wo": normal(keys[3], (L, nq * hd, D)),
            "mlp_norm": jnp.ones((L, D), dtype),
            "w_gate": normal(keys[4], (L, D, F)),
            "w_up": normal(keys[5], (L, D, F)),
            "w_down": normal(keys[6], (L, F, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
    }


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


@struct.dataclass
class KVCache:
    """Static-shape KV cache for incremental decode.

    ``k``/``v``: ``[L, B, max_len, kv_heads, head_dim]``; ``valid``: per-key
    usability mask ``[B, max_len]`` (0 for unwritten slots *and* padding
    frames); ``index``: next write position (scalar, also the position id of
    the next fed token when the caller uses sequential positions).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    valid: jnp.ndarray
    index: jnp.ndarray  # scalar, or [B] for per-stream (ragged) windows

    @classmethod
    def create(
        cls, config: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (config.num_hidden_layers, batch, max_len, config.num_key_value_heads, config.head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            valid=jnp.zeros((batch, max_len), jnp.bool_),
            index=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation, matching HF ``LlamaRMSNorm``."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed.astype(dtype)) * weight


def _attention(
    q: jnp.ndarray,  # [B, S, nq, hd]
    k: jnp.ndarray,  # [B, T, nkv, hd]
    v: jnp.ndarray,  # [B, T, nkv, hd]
    bias: jnp.ndarray,  # [B, 1, 1, S, T] additive (0 or NEG_INF)
) -> jnp.ndarray:
    """Grouped-query attention, fp32 softmax.  Returns ``[B, S, nq*hd]``.

    Masking sets disallowed scores to the finite ``NEG_INF`` (rather than
    adding it), so a fully-masked row softmaxes to exactly-uniform attention
    — bit-consistent with the Pallas flash kernel and with HF's min-dtype
    behavior.
    """
    B, S, nq, hd = q.shape
    T = k.shape[1]
    nkv = k.shape[2]
    g = nq // nkv
    qg = q.reshape(B, S, nkv, g, hd).transpose(0, 2, 3, 1, 4)  # [B,nkv,g,S,hd]
    kk = k.transpose(0, 2, 1, 3)  # [B,nkv,T,hd]
    vv = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bngsh,bnth->bngst", qg, kk, preferred_element_type=jnp.float32
    ) * (1.0 / jnp.sqrt(hd).astype(jnp.float32))
    scores = jnp.where(bias < 0, NEG_INF, scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bngst,bnth->bngsh", probs, vv)  # [B,nkv,g,S,hd]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, nq * hd)


def _layer(
    h: jnp.ndarray,
    lp: dict,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    config: LlamaConfig,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    flash_key_valid: Optional[jnp.ndarray] = None,
    qlayer: Optional[dict] = None,
    sp_mesh=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One pre-norm transformer block.  If ``cache_kv`` is given, the new K/V
    rows are written at ``cache_index`` and attention runs over the full
    cached window; returns the updated per-layer cache.

    ``flash_key_valid`` selects the Pallas flash kernel (queries assumed to
    start at absolute position 0 — prefill/training) instead of the
    bias-masked XLA path.

    ``sp_mesh`` (with ``flash_key_valid``): the frame axis is sharded over
    this mesh's ``seq`` axis — attention runs the flash kernel under
    ``shard_map`` with a per-shard query offset
    (:func:`csm_tpu.ops.flash_attention.flash_attention_sp`); callers gate
    on :func:`csm_tpu.ops.attention.sp_flash_eligible`.

    ``qlayer``: this layer's int8 weights+scales
    (:mod:`csm_tpu.ops.quant`); when given, the matmuls run W8A16 on the
    int8 MXU path — half the HBM weight traffic of bf16, and Q/K/V and
    gate/up arrive pre-fused (4 dots/layer instead of 7 at the
    latency-bound decode step).
    """
    B, S, D = h.shape
    nq, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim

    if qlayer is not None:
        from csm_tpu.ops.quant import qmm

        def mm(x, name):
            return qmm(x, qlayer["w"][name], qlayer["s"][name]).astype(h.dtype)
    else:
        def mm(x, name):
            return x @ lp[name]

    x = rmsnorm(h, lp["attn_norm"], config.rms_norm_eps)
    if qlayer is not None:
        qkv = mm(x, "wqkv")
        q = qkv[..., : nq * hd].reshape(B, S, nq, hd)
        k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(B, S, nkv, hd)
        v = qkv[..., (nq + nkv) * hd :].reshape(B, S, nkv, hd)
    else:
        q = mm(x, "wq").reshape(B, S, nq, hd)
        k = mm(x, "wk").reshape(B, S, nkv, hd)
        v = mm(x, "wv").reshape(B, S, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def attend(kk, vv):
        if flash_key_valid is not None:
            from csm_tpu.ops.attention import pick_block
            from csm_tpu.ops.flash_attention import (
                flash_attention, flash_attention_sp,
            )

            if sp_mesh is not None:
                from functools import partial

                from jax.sharding import PartitionSpec as P

                seq = dict(
                    zip(sp_mesh.axis_names, sp_mesh.devices.shape)
                )["seq"]
                fn = partial(
                    flash_attention_sp, axis_name="seq",
                    block_q=pick_block(S // seq),
                    block_k=pick_block(kk.shape[1]),
                    interpret=jax.default_backend() == "cpu",
                )
                qv = P("data", "seq", "model", None)
                out = jax.shard_map(
                    fn, mesh=sp_mesh,
                    in_specs=(qv, qv, qv, P("data", "seq")),
                    out_specs=qv,
                    # pallas_call outputs carry no varying-mesh-axes
                    # metadata, so the vma check cannot apply to them.
                    check_vma=False,
                )(q, kk.astype(q.dtype), vv.astype(q.dtype),
                  flash_key_valid)
            else:
                out = flash_attention(
                    q, kk.astype(q.dtype), vv.astype(q.dtype),
                    flash_key_valid, causal=True,
                    block_q=pick_block(S), block_k=pick_block(kk.shape[1]),
                )
            # Named for the "dots" remat policy: saving this output keeps
            # the backward from re-running the flash forward per layer.
            out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn_out")
            return out.reshape(B, S, nq * hd)
        return _attention(q, kk.astype(q.dtype), vv.astype(q.dtype), bias)

    if cache_kv is not None:
        ck, cv = cache_kv  # [B, max_len, nkv, hd]
        idx = jnp.asarray(cache_index)
        if idx.ndim == 0:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, idx, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, idx, 0, 0))
        else:
            # Per-stream write positions (ragged serving slots).
            upd = jax.vmap(
                lambda c, n, i: jax.lax.dynamic_update_slice(c, n, (i, 0, 0))
            )
            ck = upd(ck, k.astype(ck.dtype), idx)
            cv = upd(cv, v.astype(cv.dtype), idx)
        attn = attend(ck, cv)
        new_cache = (ck, cv)
    else:
        attn = attend(k, v)
        new_cache = (k, v)

    h = h + mm(attn, "wo")
    x = rmsnorm(h, lp["mlp_norm"], config.rms_norm_eps)
    if qlayer is not None:
        gu = mm(x, "w_gu")
        F = config.intermediate_size
        gated = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    else:
        gated = jax.nn.silu(mm(x, "w_gate")) * mm(x, "w_up")
    h = h + mm(gated, "w_down")
    return h, new_cache


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def make_causal_bias(
    key_valid: jnp.ndarray, q_len: int, q_offset: jnp.ndarray | int = 0
) -> jnp.ndarray:
    """Additive attention bias ``[B, 1, 1, q_len, T]``.

    ``key_valid``: ``[B, T]`` — usable key positions (excludes padding and
    unwritten cache slots).  Causality: query at absolute position
    ``q_offset + s`` may attend to key positions ``<= q_offset + s`` (cache
    layouts are position-ordered).  ``q_offset`` may be a scalar or a
    per-stream ``[B]`` vector (continuous-batching serving, where each slot
    sits at its own depth).
    """
    B, T = key_valid.shape
    q_off = jnp.asarray(q_offset)
    if q_off.ndim == 0:
        q_off = q_off[None]  # broadcast over B
    q_pos = q_off[:, None, None] + jnp.arange(q_len)[None, :, None]  # [B|1,q,1]
    k_pos = jnp.arange(T)[None, None, :]  # [1, 1, T]
    causal = k_pos <= q_pos  # [B|1, q_len, T]
    ok = causal & key_valid[:, None, :]  # [B, q_len, T]
    return jnp.where(ok, 0.0, NEG_INF)[:, None, None, :, :]


def forward(
    params: dict,
    config: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D]
    *,
    rope_table: Tuple[jnp.ndarray, jnp.ndarray],
    positions: jnp.ndarray,  # [B, S] int32 position ids
    attn_bias: Optional[jnp.ndarray],  # [B, 1, 1, S, T] additive bias
    cache: Optional[KVCache] = None,
    flash_key_valid: Optional[jnp.ndarray] = None,  # [B, T] — flash path
    qlayers: Optional[dict] = None,  # stacked int8 weights (ops.quant)
    remat: bool = False,
    remat_policy: str = "nothing",
    sp_mesh=None,  # sequence-parallel mesh (see _layer)
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the full stack via ``lax.scan`` over layers.

    Without a cache this is the training / no-cache path (T == S).  With a
    cache, K/V for the fed chunk are written at ``cache.index`` and attention
    spans the cache window (T == cache.max_len); the returned cache has its
    index advanced by ``S``.

    With ``flash_key_valid`` the layers use the Pallas flash kernel (valid
    only when queries start at absolute position 0, i.e. prefill/training);
    ``attn_bias`` may then be None.

    ``remat=True`` wraps the scan body in ``jax.checkpoint``: under
    ``jax.grad`` each layer's activations are recomputed in the backward
    instead of stored — O(L·S·D) residuals total instead of every
    per-layer intermediate.  ``remat_policy`` selects what IS saved:
    ``"nothing"`` (minimum memory, full per-layer recompute) or ``"dots"``
    (``dots_with_no_batch_dims_saveable`` — matmul outputs are kept,
    ~65 MB/layer at S=2048 B=1, and the backward skips recomputing the
    projections/MLP dots).  No effect on a pure forward pass.
    """
    cos_t, sin_t = rope_table
    cos = jnp.take(cos_t, positions, axis=0)  # [B, S, hd]
    sin = jnp.take(sin_t, positions, axis=0)

    layer_params = params["layers"]

    if cache is None:
        def body(h, xs):
            lp, ql = xs
            h, _ = _layer(h, lp, cos, sin, attn_bias, config,
                          flash_key_valid=flash_key_valid, qlayer=ql,
                          sp_mesh=sp_mesh)
            return h, None

        if remat:
            # "dots" additionally saves the flash-attention OUTPUT by name:
            # a pallas_call is not a dot_general, so dots_saveable alone
            # would re-run the whole flash forward per layer inside the
            # backward recompute (~8.4 MB bf16 saved per layer at S=2048
            # buys back that re-run).
            policy = (
                jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_attn_out"
                    ),
                )
                if remat_policy == "dots" else None
            )
            # prevent_cse is safe (and needed for efficiency) inside scan.
            body = jax.checkpoint(body, prevent_cse=False, policy=policy)
        h, _ = jax.lax.scan(body, inputs_embeds, (layer_params, qlayers))
        new_cache = None
    else:
        def body(h, xs):
            lp, ql, ck, cv = xs
            h, (nk, nv) = _layer(
                h, lp, cos, sin, attn_bias, config,
                cache_kv=(ck, cv), cache_index=cache.index,
                flash_key_valid=flash_key_valid, qlayer=ql,
            )
            return h, (nk, nv)

        h, (new_k, new_v) = jax.lax.scan(
            body, inputs_embeds, (layer_params, qlayers, cache.k, cache.v)
        )
        new_cache = dataclasses.replace(
            cache, k=new_k, v=new_v, index=cache.index + inputs_embeds.shape[1]
        )

    h = rmsnorm(h, params["final_norm"], config.rms_norm_eps)
    return h, new_cache


def forward_uncached(
    params: dict,
    config: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    *,
    rope_table: Tuple[jnp.ndarray, jnp.ndarray],
    frame_valid: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Convenience full-sequence forward (training path).

    ``frame_valid``: ``[B, S]`` key-padding mask (1 = real frame); defaults to
    all-valid.  Positions default to ``arange(S)`` per batch row — matching
    HF's ``cache_position`` semantics, which number left-padded slots too
    (SURVEY §2a#6; padding is excluded via the attention mask instead).
    """
    B, S, _ = inputs_embeds.shape
    if frame_valid is None:
        frame_valid = jnp.ones((B, S), jnp.bool_)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    bias = make_causal_bias(frame_valid, S)
    h, _ = forward(
        params, config, inputs_embeds,
        rope_table=rope_table, positions=positions, attn_bias=bias, cache=None,
    )
    return h


def rope_table_for(config: LlamaConfig, max_positions: Optional[int] = None):
    """Precompute the (cos, sin) RoPE tables for this stack."""
    return compute_rope_table(config, max_positions)

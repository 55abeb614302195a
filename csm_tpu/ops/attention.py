"""Attention implementation dispatch.

``auto`` (default): the Pallas flash kernel for multi-token forward passes
on TPU backends; the XLA einsum path for decode steps (q_len == 1), CPU
tests, and shapes the kernel's blocking cannot cover.  Override with
``CSM_TPU_ATTENTION=flash|xla`` or :func:`set_attention_impl`.
"""

from __future__ import annotations

import os

import jax

_impl = os.environ.get("CSM_TPU_ATTENTION", "auto")


def set_attention_impl(impl: str) -> None:
    """Force the attention path: ``"auto"``, ``"flash"``, or ``"xla"``."""
    global _impl
    if impl not in ("auto", "flash", "xla"):
        raise ValueError(impl)
    _impl = impl


def pick_block(n: int, cap: int = None) -> int:
    """Largest power-of-two divisor of ``n``, capped (default 512 —
    measured 9 % faster than 256 on the S=2048 CSM-1B train step on a
    v5e, loss-identical; ``CSM_FLASH_BLOCK`` overrides the cap for perf
    experiments — read at trace time, so set it before the first compile
    in a process)."""
    if cap is None:
        cap = int(os.environ.get("CSM_FLASH_BLOCK", 512))
    b = 1
    while b < cap and n % (b * 2) == 0:
        b *= 2
    return b


def flash_eligible(q_len: int, kv_len: int, head_dim: int) -> bool:
    """Whether the flash kernel should handle this (trace-time) shape."""
    if _impl == "xla":
        return False
    if q_len < 8 or pick_block(q_len) < 8 or pick_block(kv_len) < 8:
        return False
    if head_dim % 8 != 0:
        return False
    # The key-validity mask's block is [1, 1, block_k]: Mosaic requires the
    # minor block dim be a multiple of 128 or the full array dim.  (E.g. a
    # 576-slot cache window picks block_k=64 — illegal; callers round cache
    # windows to 128 so flash stays in play.)
    bk = pick_block(kv_len)
    if bk != kv_len and bk % 128 != 0:
        return False
    if _impl == "flash":
        return True
    # auto: only on a real accelerator backend
    return jax.default_backend() not in ("cpu",)


def sp_flash_eligible(mesh, batch: int, q_len: int, num_q_heads: int,
                      num_kv_heads: int, head_dim: int) -> bool:
    """Whether the sequence-parallel flash path
    (:func:`csm_tpu.ops.flash_attention.flash_attention_sp` under
    ``shard_map``) can handle this trace-time shape on this mesh.

    Requires the canonical ``(data, seq, model)`` mesh axes
    (:func:`csm_tpu.parallel.mesh.make_mesh`), every sharded dim divisible
    by its axis, and the PER-SHARD query length to satisfy the kernel's
    blocking (``kv_len`` is the gathered full sequence)."""
    if mesh is None:
        return False
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    seq = sizes.get("seq", 1)
    if seq == 1 or not {"data", "model"} <= set(sizes):
        return False
    if q_len % seq or batch % sizes["data"]:
        return False
    if num_q_heads % sizes["model"] or num_kv_heads % sizes["model"]:
        return False
    return flash_eligible(q_len // seq, q_len, head_dim)

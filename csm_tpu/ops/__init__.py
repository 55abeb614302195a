"""Core numerical ops for csm_tpu: RoPE tables, attention, sampling, and the
fused embedding-sum.  Pallas TPU kernels live in :mod:`csm_tpu.ops.pallas`;
every op has a pure-XLA reference path so tests run on CPU."""

from csm_tpu.ops.rope import compute_rope_table
from csm_tpu.ops.sampling import sample_topk, sample_topk_logits

__all__ = ["compute_rope_table", "sample_topk", "sample_topk_logits"]

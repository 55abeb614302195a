"""Data pipeline: conversation preprocessing into ``[B, S, 33]`` frame
tensors, JSONL dataset with the epoch-repetition trick, left-padding
collator with static-shape buckets, and host-side audio I/O."""

from csm_tpu.data.collator import CSMDataCollator
from csm_tpu.data.dataset import CSMAudioTextDataset
from csm_tpu.data.processor import CSMProcessor

__all__ = ["CSMProcessor", "CSMAudioTextDataset", "CSMDataCollator"]

"""Model definitions: the parametric Llama transformer stack (used twice —
backbone and intra-frame decoder) and the CSM assembly on top of it."""

from csm_tpu.models import csm, llama

__all__ = ["csm", "llama"]

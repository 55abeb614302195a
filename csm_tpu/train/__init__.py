"""Training: optax-based train step, pjit data/tensor-parallel trainer loop,
and the CLI argument surface (reference ``train.py``)."""

from csm_tpu.train.args import DataArguments, ModelArguments, TrainingArguments
from csm_tpu.train.loop import CSMTrainer, TrainState, make_train_step

__all__ = [
    "ModelArguments",
    "DataArguments",
    "TrainingArguments",
    "TrainState",
    "make_train_step",
    "CSMTrainer",
]

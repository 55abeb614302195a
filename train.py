#!/usr/bin/env python
"""CSM TPU training CLI — the counterpart of the reference ``train.py:329-512``.

Usage (reference ``README.md:201-209``):

    python train.py --train_file data.jsonl --output_dir out \
        --learning_rate 5e-6 --num_train_epochs 3 --gradient_accumulation_steps 8

Pipeline: JSONL → CSMAudioTextDataset (audio I/O + Mimi encode) →
CSMProcessor (framing + labels + amortization) → CSMDataCollator (left-pad
to a static bucket) → jitted pjit train step (optax AdamW, grad-accum,
two-loss logging) → orbax checkpoints.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger(__name__)


def main(argv=None):
    from csm_tpu.config import CSMConfig
    from csm_tpu.data import CSMAudioTextDataset, CSMDataCollator, CSMProcessor
    from csm_tpu.data.tokenizer import load_llama3_tokenizer
    from csm_tpu.models import csm as csm_model
    from csm_tpu.train import CSMTrainer
    from csm_tpu.train.args import parse_args

    model_args, data_args, training_args = parse_args(argv)

    # Multi-host (DCN) data parallelism — the torchrun-DDP counterpart
    # (``/root/reference/train.py:414-425``).  Env-guarded; a plain
    # single-host run is untouched.  Must run before jax.devices().
    from csm_tpu.parallel.mesh import maybe_init_distributed

    if maybe_init_distributed():
        logger.info(
            "multi-host: process %d/%d", jax.process_index(), jax.process_count()
        )

    np.random.seed(training_args.seed)
    logger.info("devices: %s", jax.devices())

    if model_args.config_path:
        config = CSMConfig.from_json(model_args.config_path)
    else:
        config = CSMConfig()  # CSM-1B shape

    logger.info("Loading text tokenizer...")
    text_tokenizer = load_llama3_tokenizer()

    logger.info("Loading multi-codebook audio tokenizer (Mimi)...")
    from csm_tpu.codec import load_mimi

    audio_tokenizer = load_mimi(num_codebooks=config.audio_num_codebooks)

    processor = CSMProcessor(
        text_tokenizer, audio_tokenizer,
        amortization_ratio=data_args.amortization_ratio,
    )

    if training_args.bf16:
        dtype = jax.numpy.bfloat16
    elif training_args.fp16:
        dtype = jax.numpy.float16
    else:
        dtype = jax.numpy.float32
    if model_args.model_name_or_path:
        logger.info("Loading model from %s", model_args.model_name_or_path)
        from csm_tpu.checkpoint import load_params_from_safetensors

        params = load_params_from_safetensors(
            model_args.model_name_or_path, config, dtype=dtype
        )
    else:
        logger.info("Creating a new model from default CSMConfig")
        params = csm_model.init_params(jax.random.key(training_args.seed), config, dtype)

    train_dataset = CSMAudioTextDataset(
        data_args.train_file,
        audio_cache_dir=data_args.audio_cache_dir,
        processor=processor,
        num_train_epochs=int(training_args.num_train_epochs),
        seed=training_args.seed,
    )
    eval_dataset = (
        CSMAudioTextDataset(
            data_args.eval_file,
            audio_cache_dir=data_args.audio_cache_dir,
            processor=processor,
            num_train_epochs=1,
            seed=training_args.seed,
        )
        if data_args.eval_file
        else None
    )

    # Length bucketing: pad to the next multiple of ``pad_to_multiple`` so a
    # short-utterance dataset doesn't pay the full 2048-frame attention
    # square every step; 0 falls back to a single max_seq_length bucket.
    collator = CSMDataCollator(
        text_pad_token_id=text_tokenizer.eos_token_id,
        pad_to_multiple=training_args.pad_to_multiple or 0,
        pad_to_length=(
            None if training_args.pad_to_multiple else training_args.max_seq_length
        ),
    )

    trainer = CSMTrainer(
        config, params, training_args, train_dataset,
        eval_dataset=eval_dataset, data_collator=collator,
    )
    logger.info(
        "Effective batch size: %d (per_device=%d × accum=%d × data_parallel=%d)",
        trainer.global_batch * training_args.gradient_accumulation_steps,
        training_args.per_device_train_batch_size,
        training_args.gradient_accumulation_steps,
        trainer.mesh.shape["data"],
    )
    trainer.train()
    logger.info("Saving final model to %s", training_args.output_dir)
    trainer.save_model(training_args.output_dir)


if __name__ == "__main__":
    main()

"""Whole-product integration: the README recipe at tiny scale, on CPU.

Chains every layer the way a user of the reference would
(``/root/reference/README.md:21-123`` + the ``train.py`` recipe):
real tiny JAX Mimi ENCODE inside the processor → ``CSMTrainer`` fine-tune
on the virtual mesh → ``generate`` with the trained params → Mimi DECODE
back to a waveform.  The per-layer parity suites pin exactness; this test
pins that the layers actually compose.
"""

import numpy as np
import pytest

from csm_tpu.codec import MimiCodec, MimiCodecConfig
from csm_tpu.config import CSMConfig
from csm_tpu.data.collator import CSMDataCollator
from csm_tpu.data.processor import CSMProcessor

from tests.test_codec_parity import make_mimi_pair
from tests.test_processor import StubTokenizer


# Hardware checks pin these paths on the real chip each round; the
# CPU oracle here is thorough but slow (full README recipe at tiny scale).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def recipe():
    """Tiny 32-quantizer Mimi (the processor's frame width is the
    reference's fixed 32+1) + a matching tiny CSM config."""
    mimi_cfg = MimiCodecConfig.tiny(num_quantizers=32)
    mimi_cfg, _, mimi_params = make_mimi_pair(mimi_cfg)
    codec = MimiCodec(mimi_cfg, mimi_params)
    # audio vocab covers the codec's code range 0..codebook_size-1
    cfg = CSMConfig.tiny(audio_vocab_size=mimi_cfg.codebook_size + 1)
    return cfg, codec


def _conversations(codec, n=3):
    """Short two-message conversations with real (random) audio."""
    proc = CSMProcessor(StubTokenizer(), codec, amortization_ratio=4)
    frame = int(codec.sample_rate / codec.frame_rate)
    items = []
    for i in range(n):
        rng = np.random.default_rng(10 + i)
        wave = (0.3 * rng.standard_normal(3 * frame)).astype(np.float32)
        messages = [
            {"role": "speaker_0", "content": [{"type": "text", "text": "hi"}]},
            {
                "role": "speaker_1",
                "content": [{"type": "text", "text": "ok"},
                            {"type": "audio", "url": f"clip{i}.wav"}],
            },
        ]
        out = proc(messages=messages, audios=[wave],
                   max_length=24, return_tensors="np")
        # the conversation must actually contain audio frames (cols 0-31
        # live) — guards against silently training text-only
        assert (out["attention_mask"][0][:, :-1] == 1).any()
        items.append({
            "input_ids": out["input_ids"][0],
            "attention_mask": out["attention_mask"][0],
            "labels": out["labels"][0],
        })
    return items


class _ListDataset:
    amortization_ratio = 4

    def __init__(self, items, epochs):
        self.items, self.epochs = items, epochs

    def __len__(self):
        return len(self.items) * self.epochs

    def __getitem__(self, i):
        return self.items[i % len(self.items)]


def test_readme_recipe_end_to_end(recipe, tmp_path):
    import jax

    from csm_tpu.generation import generate
    from csm_tpu.models import csm
    from csm_tpu.parallel.mesh import make_mesh
    from csm_tpu.train.args import TrainingArguments
    from csm_tpu.train.loop import CSMTrainer

    cfg, codec = recipe
    items = _conversations(codec)
    S = max(it["input_ids"].shape[0] for it in items)
    pad = ((S + 7) // 8) * 8

    args = TrainingArguments(
        output_dir=str(tmp_path),
        learning_rate=5e-3,
        per_device_train_batch_size=1,
        gradient_accumulation_steps=3,
        max_seq_length=pad,
        save_strategy="no",
        mesh_data=4,
        mesh_model=2,
        seed=42,
    )
    ds = _ListDataset(items, epochs=6)
    coll = CSMDataCollator(text_pad_token_id=0, pad_to_length=pad)
    params = csm.init_params(jax.random.key(0), cfg)
    trainer = CSMTrainer(cfg, params, args, ds, data_collator=coll,
                         mesh=make_mesh(data=4, model=2))
    metrics = trainer.train()
    hist = trainer.loss_history if hasattr(trainer, "loss_history") else None
    final_loss = float(metrics["loss"])
    # random-init CE ≈ ln(text_vocab) + 2·ln(audio_vocab); training on 3
    # repeated conversations must overfit well below that.
    init_ceiling = np.log(cfg.text_vocab_size) + 2 * np.log(cfg.audio_vocab_size)
    assert final_loss < init_ceiling * 0.8, (final_loss, init_ceiling, hist)

    # Generate continuation audio for a prompt with the trained params.
    trained = trainer.state.params
    prompt = items[0]
    ids = prompt["input_ids"][None]
    mask = prompt["attention_mask"][None].astype(np.float32)
    frames = generate(
        trained, cfg, ids, mask, max_new_frames=4, greedy=True,
        stop_on_all_zeros=False, rng=jax.random.key(3),
    )
    assert frames.shape == (1, 4, cfg.audio_num_codebooks)
    assert frames.min() >= 0 and frames.max() < cfg.audio_vocab_size

    # Decode the generated frames back to audio (README.md:114-118).
    # Clip to the codec's code range: CSM's audio vocab has one extra id.
    codes = np.minimum(frames[0].T, codec.config.codebook_size - 1)
    wave = codec.decode(codes)
    frame_size = int(codec.sample_rate / codec.frame_rate)
    assert wave.shape == (4 * frame_size,)
    assert np.isfinite(wave).all()

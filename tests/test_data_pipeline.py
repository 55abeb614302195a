"""Audio I/O, collator, and dataset tests (reference behaviors from
``train.py:45-209``)."""

import json
import os

import numpy as np
import pytest

from csm_tpu.data.audio_io import load_audio_mono, load_wav, resample, save_wav, to_mono
from csm_tpu.data.collator import IGNORE_INDEX, CSMDataCollator
from csm_tpu.data.dataset import CSMAudioTextDataset
from csm_tpu.data.processor import CSMProcessor

from tests.test_processor import StubCodec, StubTokenizer


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wave = np.clip(rng.standard_normal(2400) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "a.wav")
    save_wav(path, wave, 24000)
    loaded, rate = load_wav(path)
    assert rate == 24000
    assert loaded.shape == (1, 2400)
    np.testing.assert_allclose(loaded[0], wave, atol=2 / 32768)


def test_stereo_to_mono_and_resample(tmp_path):
    rng = np.random.default_rng(1)
    stereo = (rng.standard_normal((2, 4800)) * 0.3).astype(np.float32)
    path = str(tmp_path / "s.wav")
    save_wav(path, stereo, 48000)
    mono = load_audio_mono(path, 24000)
    assert mono.ndim == 1
    assert abs(len(mono) - 2400) <= 1
    # resample of a pure tone preserves its frequency content
    t = np.arange(48000) / 48000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    down = resample(tone, 48000, 24000)
    spec = np.abs(np.fft.rfft(down))
    assert abs(np.argmax(spec) * 24000 / len(down) - 440) < 2


def test_collator_left_pad_semantics():
    f1 = {
        "input_ids": np.ones((3, 33), np.int64),
        "attention_mask": np.ones((3, 33), np.int64),
        "labels": np.ones((3, 33), np.int64),
    }
    f2 = {
        "input_ids": np.full((5, 33), 2, np.int64),
        "attention_mask": np.ones((5, 33), np.int64),
        "labels": np.full((5, 33), 2, np.int64),
    }
    coll = CSMDataCollator(text_pad_token_id=99)
    out = coll([f1, f2])
    assert out["input_ids"].shape == (2, 5, 33)
    # Left padding: first 2 rows of item 1 are pad.
    assert (out["labels"][0, :2] == IGNORE_INDEX).all()
    assert (out["attention_mask"][0, :2] == 0).all()
    assert (out["input_ids"][0, :2, :32] == 0).all()
    assert (out["input_ids"][0, :2, 32] == 99).all()  # text col pad = eos id
    np.testing.assert_array_equal(out["input_ids"][0, 2:], f1["input_ids"])
    np.testing.assert_array_equal(out["input_ids"][1], f2["input_ids"])


def test_collator_static_bucket():
    f = {
        "input_ids": np.ones((5, 33), np.int64),
        "attention_mask": np.ones((5, 33), np.int64),
        "labels": np.ones((5, 33), np.int64),
    }
    out = CSMDataCollator(text_pad_token_id=0, pad_to_multiple=8)([dict(f)])
    assert out["input_ids"].shape == (1, 8, 33)
    out = CSMDataCollator(text_pad_token_id=0, pad_to_length=16)([dict(f)])
    assert out["input_ids"].shape == (1, 16, 33)
    with pytest.raises(ValueError):
        CSMDataCollator(text_pad_token_id=0, pad_to_length=4)([dict(f)])


def test_dataset_jsonl(tmp_path):
    # Build a 2-conversation JSONL with one real and one missing audio file.
    wav_path = str(tmp_path / "u.wav")
    rng = np.random.default_rng(2)
    save_wav(wav_path, (rng.standard_normal(160 * 8) * 0.2).astype(np.float32), 24000)

    rows = [
        {
            "messages": [
                {"role": "speaker_0", "content": [{"type": "text", "text": "one"}]},
                {
                    "role": "speaker_1",
                    "content": [
                        {"type": "text", "text": "two"},
                        {"type": "audio", "url": wav_path},
                    ],
                },
            ],
            "training_mask": [0, 1],
        },
        {
            "messages": [
                {
                    "role": "speaker_0",
                    "content": [
                        {"type": "text", "text": "three"},
                        {"type": "audio", "url": str(tmp_path / "missing.wav")},
                    ],
                }
            ]
        },
    ]
    data_path = str(tmp_path / "d.jsonl")
    with open(data_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    proc = CSMProcessor(StubTokenizer(), StubCodec())
    ds = CSMAudioTextDataset(data_path, processor=proc, num_train_epochs=3)

    # Epoch-repetition trick (``train.py:81-87``).
    assert len(ds) == 6
    item = ds[0]
    assert item["input_ids"].ndim == 2 and item["input_ids"].shape[1] == 33
    # index wraps modulo the real data size
    assert ds[2]["input_ids"].shape == ds[0]["input_ids"].shape

    # Missing audio degrades softly: conversation still yields text frames.
    item2 = ds[1]
    assert item2["input_ids"].shape[0] == len(StubTokenizer().encode("[0]three"))

"""Processor golden tests + parity vs the torch reference processor
(SURVEY §4.2): identical stub tokenizers on both sides, exact
``[S, 33]`` tensor comparison (amortization off for determinism; the seeded
amortization path is tested structurally on our side)."""

import sys

import numpy as np
import pytest

from csm_tpu.data.processor import IGNORE_INDEX, CSMProcessor

BOS, EOS = 1, 2


class StubTokenizer:
    """Deterministic char-level tokenizer with BOS/EOS wrapping (standing in
    for the Llama tokenizer + TemplateProcessing, ``train.py:283-300``)."""

    bos_token_id = BOS
    eos_token_id = EOS

    def encode(self, text, add_special_tokens=True):
        core = [10 + (ord(c) % 80) for c in text]
        return [BOS] + core + [EOS] if add_special_tokens else core


def stub_codes(wave: np.ndarray) -> np.ndarray:
    """Deterministic fake RVQ encoding: [32, T//160] codes from the wave."""
    t = max(1, len(wave) // 160)
    base = (np.abs(wave[: t * 160]).reshape(t, 160).sum(axis=1) * 1000).astype(np.int64)
    cb = np.arange(32, dtype=np.int64)[:, None]
    return (base[None, :] + cb * 7) % 2051 + 1


class StubCodec:
    sample_rate = 24000

    def encode(self, wave):
        return stub_codes(np.asarray(wave))


def make_convo():
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(160 * 5).astype(np.float32)
    messages = [
        {"role": "speaker_0", "content": [{"type": "text", "text": "hello there"}]},
        {
            "role": "speaker_1",
            "content": [
                {"type": "text", "text": "hi"},
                {"type": "audio", "url": "x.wav"},
            ],
        },
    ]
    return messages, [None, wave]


def test_frame_layout_golden():
    messages, audios = make_convo()
    proc = CSMProcessor(StubTokenizer(), StubCodec())
    out = proc(
        messages=messages, audios=[audios[1]],
        amortize_decoder_training=False, return_tensors="np",
    )
    ids, mask, labels = out["input_ids"][0], out["attention_mask"][0], out["labels"][0]

    t0 = StubTokenizer().encode("[0]hello there")
    t1 = StubTokenizer().encode("[1]hi")
    n_audio = 5 + 1  # 5 code frames + zero EOS frame
    S = len(t0) + len(t1) + n_audio
    assert ids.shape == (S, 33)

    # Text frames: col 32 = token, cols 0-31 zero, mask only on col 32.
    np.testing.assert_array_equal(ids[: len(t0), 32], t0)
    assert (ids[: len(t0), :32] == 0).all()
    assert (mask[: len(t0), 32] == 1).all() and (mask[: len(t0), :32] == 0).all()

    # Audio frames: cols 0-31 = codes.T, col 32 zero, mask on cols 0-31.
    a0 = len(t0) + len(t1)
    codes = stub_codes(audios[1])
    np.testing.assert_array_equal(ids[a0 : a0 + 5, :32], codes.T)
    np.testing.assert_array_equal(ids[a0 + 5], np.zeros(33))  # zero EOS frame
    assert (mask[a0 : a0 + 6, :32] == 1).all() and (mask[a0 : a0 + 6, 32] == 0).all()

    # Labels: -100 where mask==0 and always in the text column.
    assert (labels[:, 32] == IGNORE_INDEX).all()
    assert (labels[: len(t0), :32] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(labels[a0 : a0 + 6, :32], ids[a0 : a0 + 6, :32])


def test_parity_vs_reference_processor():
    """Exact tensor parity with the torch reference processor on the same
    stub tokenizers (amortization off)."""
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from processor import CSMProcessor as RefProcessor

    class TorchStubCodec(torch.nn.Module):
        sample_rate = 24000

        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def encode(self, x):  # [1, 1, T] -> [1, 32, T']
            codes = stub_codes(x[0, 0].numpy())
            return torch.from_numpy(codes)[None]

    messages, audios = make_convo()
    ref = RefProcessor(StubTokenizer(), TorchStubCodec())
    ours = CSMProcessor(StubTokenizer(), StubCodec())

    r = ref(
        messages=messages, audios=[torch.from_numpy(audios[1])],
        amortize_decoder_training=False, return_tensors="pt",
    )
    o = ours(
        messages=messages, audios=[audios[1]],
        amortize_decoder_training=False, return_tensors="np",
    )
    np.testing.assert_array_equal(o["input_ids"], r["input_ids"].numpy())
    np.testing.assert_array_equal(o["attention_mask"], r["attention_mask"].numpy())
    np.testing.assert_array_equal(o["labels"], r["labels"].numpy())


def test_parity_batched_left_padding():
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from processor import CSMProcessor as RefProcessor

    class TorchStubCodec(torch.nn.Module):
        sample_rate = 24000

        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def encode(self, x):
            return torch.from_numpy(stub_codes(x[0, 0].numpy()))[None]

    messages, audios = make_convo()
    short = [{"role": "speaker_0", "content": [{"type": "text", "text": "yo"}]}]

    ref = RefProcessor(StubTokenizer(), TorchStubCodec())
    ours = CSMProcessor(StubTokenizer(), StubCodec())
    r = ref(
        messages=[messages, short], audios=[[torch.from_numpy(audios[1])], None],
        amortize_decoder_training=False, return_tensors="pt",
    )
    o = ours(
        messages=[messages, short], audios=[[audios[1]], None],
        amortize_decoder_training=False, return_tensors="np",
    )
    for k in ("input_ids", "attention_mask", "labels"):
        np.testing.assert_array_equal(o[k], r[k].numpy(), err_msg=k)


def test_amortization_structure():
    """Seeded amortization: c0+valid labels kept everywhere, codebooks 1-31
    kept on exactly max(1, n//ratio) frames; deterministic per seed."""
    messages, audios = make_convo()
    proc = CSMProcessor(StubTokenizer(), StubCodec())

    def run(seed):
        return proc(
            messages=messages, audios=[audios[1]],
            amortize_decoder_training=True, amortization_ratio=3,
            rng=np.random.default_rng(seed), return_tensors="np",
        )["labels"][0]

    labels = run(0)
    full = proc(
        messages=messages, audios=[audios[1]],
        amortize_decoder_training=False, return_tensors="np",
    )["labels"][0]

    valid = np.any(full != IGNORE_INDEX, axis=-1)
    n_valid = int(valid.sum())
    # c0 labels preserved on all valid frames
    np.testing.assert_array_equal(labels[valid, 0], full[valid, 0])
    # codebooks 1..31 survive on exactly max(1, n//ratio) frames
    with_dec = np.all(labels[:, 1:32] != IGNORE_INDEX, axis=-1) & valid
    assert with_dec.sum() == max(1, n_valid // 3)
    # deterministic per seed, varies across seeds
    np.testing.assert_array_equal(labels, run(0))
    assert (run(1) != labels).any()


def test_message_training_mask():
    messages, audios = make_convo()
    proc = CSMProcessor(StubTokenizer(), StubCodec())
    out = proc(
        messages=messages, audios=[audios[1]],
        messages_training_mask=[False, True],
        amortize_decoder_training=False, return_tensors="np",
    )
    labels = out["labels"][0]
    n_msg0 = len(StubTokenizer().encode("[0]hello there"))
    assert (labels[:n_msg0] == IGNORE_INDEX).all()
    assert (labels[n_msg0:, :32] != IGNORE_INDEX).any()


def test_single_text_mode():
    """The reference's broken single-text path, implemented as intended
    (``processor.py:185-194``)."""
    proc = CSMProcessor(StubTokenizer(), StubCodec())
    out = proc(text="generate me", speaker_id=3, return_tensors="np")
    toks = StubTokenizer().encode("[3]generate me")
    assert out["input_ids"].shape == (1, len(toks), 33)
    np.testing.assert_array_equal(out["input_ids"][0, :, 32], toks)


def test_truncation_keeps_tail():
    messages, audios = make_convo()
    proc = CSMProcessor(StubTokenizer(), StubCodec())
    full = proc(
        messages=messages, audios=[audios[1]],
        amortize_decoder_training=False, return_tensors="np",
    )["input_ids"][0]
    trunc = proc(
        messages=messages, audios=[audios[1]], max_length=7,
        amortize_decoder_training=False, return_tensors="np",
    )["input_ids"][0]
    assert trunc.shape[0] == 7
    np.testing.assert_array_equal(trunc, full[-7:])

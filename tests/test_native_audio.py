"""Native C++ audio runtime vs the pure-Python/scipy behavior spec."""

import numpy as np
import pytest

from csm_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native audio library unavailable (no compiler)")


def test_wav_roundtrip_native(tmp_path):
    rng = np.random.default_rng(0)
    wave = np.clip(rng.standard_normal((2, 2400)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "n.wav")
    native.wav_write(p, wave, 24000)
    loaded, rate = native.wav_read(p)
    assert rate == 24000 and loaded.shape == (2, 2400)
    np.testing.assert_allclose(loaded, wave, atol=2 / 32768)


def test_wav_native_reads_python_written(tmp_path):
    """Cross-compatibility with the stdlib writer (and vice versa)."""
    import wave as pywave

    from csm_tpu.data import audio_io

    rng = np.random.default_rng(1)
    mono = np.clip(rng.standard_normal(1000) * 0.5, -0.99, 0.99).astype(np.float32)
    p1 = str(tmp_path / "py.wav")
    # Force the pure-python writer
    pcm = np.clip(mono * 32767.0, -32768, 32767).astype("<i2")
    with pywave.open(p1, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    nat, rate = native.wav_read(p1)
    assert rate == 16000
    np.testing.assert_allclose(nat[0], pcm.astype(np.float32) / 32768.0, atol=1e-6)

    # And the python reader reads a native-written file identically.
    p2 = str(tmp_path / "nat.wav")
    native.wav_write(p2, mono, 16000)
    via_io, rate2 = audio_io.load_wav(p2)  # native path, same result
    assert rate2 == 16000


def test_mono_mix_matches_numpy():
    rng = np.random.default_rng(2)
    stereo = rng.standard_normal((2, 777)).astype(np.float32)
    np.testing.assert_allclose(
        native.mono_mix(stereo), stereo.mean(axis=0), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("orig,target", [(48000, 24000), (16000, 24000), (44100, 24000)])
def test_resample_matches_scipy(orig, target):
    from math import gcd

    from scipy.signal import resample_poly as scipy_resample

    rng = np.random.default_rng(3)
    t = np.arange(orig) / orig
    wave = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(orig)).astype(
        np.float32
    )
    got = native.resample_poly(wave, orig, target)
    g = gcd(orig, target)
    ref = scipy_resample(wave.astype(np.float64), target // g, orig // g)
    assert len(got) == len(ref)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_resample_preserves_tone():
    t = np.arange(48000) / 48000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    down = native.resample_poly(tone, 48000, 24000)
    spec = np.abs(np.fft.rfft(down))
    assert abs(np.argmax(spec) * 24000 / len(down) - 440) < 2

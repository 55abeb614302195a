"""Native (C++) audio runtime bindings.

Compiles ``audio.cpp`` on first use (g++ -O3, cached next to the source)
and exposes it through ctypes — no pybind11 dependency.  All entry points
mirror :mod:`csm_tpu.data.audio_io`'s pure-Python equivalents, which are
the fallback when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "audio.cpp"), os.path.join(_HERE, "codecs.cpp")]
_SO = os.path.join(_HERE, "_audio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _SO,
         "-ldl"],
        check=True, capture_output=True,
    )


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            src_mtime = max(os.path.getmtime(s) for s in _SRCS)
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _load_failed = True
            return None

        c_float_p = ctypes.POINTER(ctypes.c_float)
        read_sig = [
            ctypes.c_char_p, ctypes.POINTER(c_float_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        for fn in ("wav_read", "flac_read", "mp3_read", "ogg_read", "audio_read",
                   "ffmpeg_read"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = read_sig
        lib.wav_free.argtypes = [c_float_p]
        lib.wav_write.restype = ctypes.c_int
        lib.wav_write.argtypes = [
            ctypes.c_char_p, c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ]
        lib.mono_mix.argtypes = [c_float_p, ctypes.c_int, ctypes.c_long, c_float_p]
        lib.resample_poly_len.restype = ctypes.c_long
        lib.resample_poly_len.argtypes = [ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.resample_poly.argtypes = [
            c_float_p, ctypes.c_long, ctypes.c_int, ctypes.c_int, c_float_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _read_via(fn_name: str, path: str) -> Tuple[np.ndarray, int]:
    lib = load()
    data = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    frames = ctypes.c_long()
    rc = getattr(lib, fn_name)(
        path.encode(), ctypes.byref(data), ctypes.byref(ch),
        ctypes.byref(rate), ctypes.byref(frames),
    )
    if rc != 0:
        hint = ""
        if rc == -30:
            hint = (
                "; unrecognized container — supported natively: WAV, FLAC, "
                "MP3, OGG/Vorbis; AAC/M4A/MP4 and other containers require "
                "the system FFmpeg libraries (libavformat/libavcodec), "
                "which could not be loaded"
            )
        elif rc in (-51, -52, -53, -54, -55, -56, -57):
            hint = "; FFmpeg could not decode an audio stream from this file"
        raise IOError(f"{fn_name}({path}) failed with code {rc}{hint}")
    try:
        n = frames.value * ch.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.wav_free(data)
    return arr.reshape(frames.value, ch.value).T, rate.value


def wav_read(path: str) -> Tuple[np.ndarray, int]:
    """WAV → (``[channels, samples]`` float32, sample_rate)."""
    return _read_via("wav_read", path)


def audio_read(path: str) -> Tuple[np.ndarray, int]:
    """Any supported container → (``[channels, samples]`` float32,
    sample_rate).  WAV / FLAC / MP3 / OGG are sniffed by magic bytes and
    decoded by the built-in paths; anything else (AAC/M4A/MP4, WMA, ALAC,
    ...) falls back to the system FFmpeg libraries when present — matching
    the breadth the reference gets from torchaudio
    (``/root/reference/train.py:117-126``).  Raises ``IOError`` naming the
    support matrix when no decoder can handle the file."""
    return _read_via("audio_read", path)


def ffmpeg_read(path: str) -> Tuple[np.ndarray, int]:
    """Decode ``path`` through the FFmpeg backstop directly (bypasses the
    magic-byte dispatch; used by tests to exercise the FFmpeg path on
    containers the built-ins would otherwise claim)."""
    return _read_via("ffmpeg_read", path)


def wav_write(path: str, wave: np.ndarray, sample_rate: int) -> None:
    """float32 ``[samples]`` or ``[channels, samples]`` → 16-bit PCM WAV."""
    lib = load()
    wave = np.asarray(wave, np.float32)
    if wave.ndim == 1:
        wave = wave[None, :]
    interleaved = np.ascontiguousarray(wave.T.reshape(-1))
    rc = lib.wav_write(
        path.encode(), interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wave.shape[0], sample_rate, wave.shape[1],
    )
    if rc != 0:
        raise IOError(f"wav_write({path}) failed with code {rc}")


def mono_mix(wave: np.ndarray) -> np.ndarray:
    """``[channels, samples]`` → ``[samples]`` channel mean."""
    lib = load()
    wave = np.asarray(wave, np.float32)
    if wave.ndim == 1:
        return wave
    interleaved = np.ascontiguousarray(wave.T.reshape(-1))
    out = np.empty(wave.shape[1], np.float32)
    lib.mono_mix(
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wave.shape[0], wave.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resample_poly(wave: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Rational polyphase resample (scipy-compatible Kaiser-sinc design)."""
    lib = load()
    wave = np.ascontiguousarray(wave, np.float32)
    if orig_rate == target_rate:
        return wave
    from math import gcd

    g = gcd(orig_rate, target_rate)
    up, down = target_rate // g, orig_rate // g
    n_out = lib.resample_poly_len(len(wave), up, down)
    out = np.empty(n_out, np.float32)
    lib.resample_poly(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wave),
        up, down, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out

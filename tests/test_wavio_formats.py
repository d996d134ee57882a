"""wavio RIFF parser: 24-bit / float / EXTENSIBLE coverage.

The pure-Python reader must match the native bank's format support
(PCM 16/24/32, float32/64, EXTENSIBLE) so no source format strands a song
on the host fallback (reference loads via soundfile, which reads all of
these: ``loader_utils.py:31-70``).
"""
import struct
import wave

import numpy as np
import pytest

from music_mixing_style_transfer_tpu.data.wavio import (
    read_wav,
    read_wav_stereo_ct_i16,
    wav_length,
    write_wav,
)
from test_native import (
    _write_extensible_pcm16_wav,
    _write_float32_wav,
    _write_pcm24_wav,
)


def test_read_float32_wav(tmp_path, rng):
    a = (rng.standard_normal((3000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    _write_float32_wav(p, a, extra_chunk=True)  # junk chunk before fmt
    x, rate = read_wav(p)
    assert rate == 44100 and wav_length(p) == 3000
    np.testing.assert_array_equal(x, a)
    # segment read
    seg, _ = read_wav(p, start=100, duration=50)
    np.testing.assert_array_equal(seg, a[100:150])


def test_read_pcm24_wav(tmp_path, rng):
    vals = rng.integers(-(2**23), 2**23, size=(2000, 2), dtype=np.int32)
    p = str(tmp_path / "p24.wav")
    _write_pcm24_wav(p, vals)
    x, _ = read_wav(p)
    np.testing.assert_allclose(x, vals.astype(np.float32) / 2.0**23, atol=1e-7)


def test_read_extensible_pcm16(tmp_path, rng):
    pcm = rng.integers(-30000, 30000, size=(1500, 2), dtype=np.int16)
    p = str(tmp_path / "ext.wav")
    _write_extensible_pcm16_wav(p, pcm)
    x, _ = read_wav(p)
    np.testing.assert_array_equal(x, pcm.astype(np.float32) / 2.0**15)
    # EXTENSIBLE 16-bit PCM qualifies for the raw-int16 fast path too
    raw = read_wav_stereo_ct_i16(p)
    np.testing.assert_array_equal(raw, pcm.T)


def test_read_pcm32_and_float64(tmp_path, rng):
    a = np.clip(rng.standard_normal((800, 1)) * 0.4, -0.9, 0.9).astype(np.float64)
    # 32-bit int PCM via stdlib wave
    p32 = str(tmp_path / "p32.wav")
    with wave.open(p32, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(44100)
        w.writeframes((a * 2**31).astype("<i4").tobytes())
    x, _ = read_wav(p32)
    np.testing.assert_allclose(x, a.astype(np.float32), atol=1e-6)
    # float64: hand-rolled fmt=3, 64-bit
    p64 = str(tmp_path / "f64.wav")
    data = a.astype("<f8").tobytes()
    with open(p64, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100, 44100 * 8, 8, 64))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    x, _ = read_wav(p64)
    np.testing.assert_allclose(x, a.astype(np.float32), atol=1e-7)


def test_i16_fast_path_rejects_non16(tmp_path, rng):
    a = (rng.standard_normal((500, 2)) * 0.3).astype(np.float32)
    p = str(tmp_path / "f.wav")
    _write_float32_wav(p, a)
    with pytest.raises(ValueError):
        read_wav_stereo_ct_i16(p)


def test_rate_mismatch_and_garbage(tmp_path, rng):
    a = (rng.standard_normal((100, 2)) * 0.1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, a, rate=22050)
    with pytest.raises(ValueError):
        read_wav(p, expected_rate=44100)
    g = str(tmp_path / "garbage.wav")
    with open(g, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(ValueError):
        read_wav(g)


def test_roundtrip_pcm16_unchanged(tmp_path, rng):
    """write_wav -> read_wav stays byte-exact (guards the parser rewrite)."""
    pcm = rng.integers(-32768, 32767, size=(1234, 2), dtype=np.int16)
    p = str(tmp_path / "rt.wav")
    write_wav(p, pcm)
    np.testing.assert_array_equal(read_wav_stereo_ct_i16(p), pcm.T)
    x, _ = read_wav(p, start=7, duration=100)
    np.testing.assert_array_equal(x, pcm[7:107].astype(np.float32) / 2.0**15)

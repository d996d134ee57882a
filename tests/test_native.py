"""Native C++ DSP library: build, bind, and cross-check against JAX/scipy."""
import os
import struct
import wave

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from music_mixing_style_transfer_tpu import native
from music_mixing_style_transfer_tpu.data.native_loader import open_wav_bank
from music_mixing_style_transfer_tpu.data.wavio import read_wav, write_wav
from music_mixing_style_transfer_tpu.ops import (
    biquad_apply,
    compressor_process as jax_compressor,
    rbj_coeffs,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_compressor_matches_jax(rng):
    x = (rng.standard_normal((2, 6000)) * 0.5).astype(np.float32)
    y_native = native.compressor_process(x, -20.0, 5.0, 120.0, 6.0)
    y_jax = np.asarray(jax_compressor(jnp.asarray(x), -20.0, 5.0, 120.0, 6.0, 0.0))
    np.testing.assert_allclose(y_native, y_jax, rtol=1e-3, atol=1e-4)


def test_native_compressor_expander(rng):
    x = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    y_native = native.compressor_process(x, -20.0, 5.0, 120.0, 0.25)
    y_jax = np.asarray(jax_compressor(jnp.asarray(x), -20.0, 5.0, 120.0, 0.25, 0.0))
    np.testing.assert_allclose(y_native, y_jax, rtol=1e-3, atol=1e-4)


def test_native_biquad_matches_scipy(rng):
    coeffs = np.asarray(rbj_coeffs("peaking", 8.0, 0.9, 1500.0, 44100.0), np.float64)
    x = rng.standard_normal(4000).astype(np.float32)
    ref = scipy.signal.lfilter(coeffs[:3], [1.0, coeffs[3], coeffs[4]], x)
    y = native.biquad_lfilter(x, coeffs)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_native_cascade_matches_jax(rng):
    cs = np.stack(
        [
            np.asarray(rbj_coeffs("low_shelf", 5.0, 0.707, 100.0, 44100.0)),
            np.asarray(rbj_coeffs("peaking", -6.0, 1.2, 2000.0, 44100.0)),
            np.asarray(rbj_coeffs("high_shelf", 3.0, 0.707, 8000.0, 44100.0)),
        ]
    ).astype(np.float64)
    x = rng.standard_normal(5000).astype(np.float32)
    y_native = native.biquad_cascade(x, cs)
    y_jax = np.asarray(x)
    for c in cs:
        y_jax = np.asarray(biquad_apply(jnp.asarray(y_jax), jnp.asarray(c, jnp.float32)))
    rms = np.sqrt(np.mean(y_native**2))
    assert np.sqrt(np.mean((y_native - y_jax) ** 2)) / rms < 2e-3


# ---------------------------------------------------------------------------
# Native wav bank (cpp/mstio.cc)
# ---------------------------------------------------------------------------

def _write_float32_wav(path, audio, rate=44100, extra_chunk=False):
    """Hand-rolled IEEE-float WAV (fmt=3); optional junk chunk before fmt."""
    audio = np.asarray(audio, np.float32)  # [T, C]
    t, c = audio.shape
    data = audio.astype("<f4").tobytes()
    chunks = b""
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 10) + b"INFOjunk12"  # odd->padded
        chunks += b"\x00" * (len(chunks) & 1)
    fmt = struct.pack("<HHIIHH", 3, c, rate, rate * c * 4, c * 4, 32)
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def _write_extensible_pcm16_wav(path, pcm, rate=44100):
    """WAVE_FORMAT_EXTENSIBLE wrapper around int16 PCM."""
    pcm = np.asarray(pcm, "<i2")  # [T, C]
    t, c = pcm.shape
    data = pcm.tobytes()
    sub = struct.pack("<H", 1) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, c, rate, rate * c * 2, c * 2, 16, 22, 16, 0x3) + sub
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def _write_pcm24_wav(path, samples24, rate=44100):
    """24-bit PCM via stdlib wave (sampwidth=3); samples24 int32 [T, C]."""
    s = np.asarray(samples24, np.int32)
    raw = bytearray()
    for v in s.reshape(-1):
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    with wave.open(path, "w") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(3)
        w.setframerate(rate)
        w.writeframes(bytes(raw))


def test_wav_bank_matches_wavio_pcm16(tmp_path, rng):
    paths = []
    for i, (t, ch) in enumerate([(5000, 2), (3000, 1), (4096, 2)]):
        a = (rng.standard_normal((t, ch)) * 0.3).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, a)
        paths.append(p)
    bank = open_wav_bank(paths)
    assert bank is not None
    assert bank.frames == [5000, 3000, 4096]
    assert bank.rates == [44100] * 3

    file_idx = [0, 1, 2, 1, 0]
    starts = [0, 100, 4000, 2900, 4990]
    dur = 512
    got = bank.read_segments(file_idx, starts, dur)
    assert got.shape == (5, 2, dur)
    for k, (fi, st) in enumerate(zip(file_idx, starts)):
        ref, _ = read_wav(paths[fi], start=st, duration=min(dur, bank.frames[fi] - st))
        ref = ref.T
        if ref.shape[0] == 1:
            ref = np.repeat(ref, 2, 0)
        exp = np.zeros((2, dur), np.float32)
        exp[:, : ref.shape[1]] = ref
        np.testing.assert_array_equal(got[k], exp)
    bank.close()


def test_wav_bank_float32_and_extensible(tmp_path, rng):
    a = (rng.standard_normal((2000, 2)) * 0.5).astype(np.float32)
    pf = str(tmp_path / "f32.wav")
    _write_float32_wav(pf, a, extra_chunk=True)
    pcm = (rng.standard_normal((1500, 2)) * 8000).astype("<i2")
    pe = str(tmp_path / "ext16.wav")
    _write_extensible_pcm16_wav(pe, pcm)

    bank = open_wav_bank([pf, pe])
    assert bank is not None
    assert bank.frames == [2000, 1500]
    seg = bank.read_segments([0], [37], 256)[0]
    np.testing.assert_array_equal(seg, a[37 : 37 + 256].T)
    seg = bank.read_segments([1], [10], 128)[0]
    np.testing.assert_allclose(seg, pcm[10:138].astype(np.float32).T / 32768.0)
    bank.close()


def test_wav_bank_pcm24(tmp_path, rng):
    vals = rng.integers(-(2**23), 2**23, size=(800, 2), dtype=np.int32)
    p = str(tmp_path / "p24.wav")
    _write_pcm24_wav(p, vals)
    bank = open_wav_bank([p])
    assert bank is not None
    seg = bank.read_segments([0], [0], 800)[0]
    np.testing.assert_allclose(seg, vals.astype(np.float32).T / 2.0**23, atol=1e-7)
    bank.close()


def test_wav_bank_threaded_batch_deterministic(tmp_path, rng):
    paths = []
    for i in range(6):
        t = int(rng.integers(2000, 9000))
        a = (rng.standard_normal((t, 2)) * 0.3).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / f"t{i}.wav")
        write_wav(p, a)
        paths.append(p)
    bank = open_wav_bank(paths)
    assert bank is not None
    n = 64
    fi = rng.integers(0, len(paths), size=n)
    st = np.array([int(rng.integers(0, bank.frames[int(f)])) for f in fi])
    a1 = bank.read_segments(fi, st, 1024, n_threads=1)
    a8 = bank.read_segments(fi, st, 1024, n_threads=8)
    np.testing.assert_array_equal(a1, a8)
    bank.close()


def test_wav_bank_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all, definitely")
    assert open_wav_bank([p]) is None


def test_musdb_files_native_matches_python(tmp_path, rng):
    from music_mixing_style_transfer_tpu.data.datasets import _MUSDBFiles

    d = tmp_path / "train"
    os.makedirs(d)
    for inst in ("drums", "bass"):
        for i, t in enumerate([30000, 50000]):
            a = (rng.standard_normal((t, 2)) * 0.2).clip(-1, 1).astype(np.float32)
            write_wav(
                str(d / f"{inst}_normalized_eqcompimagegain_silence_trimmed{i}.wav"), a
            )
    kw = dict(instruments=("drums", "bass"))
    fn = _MUSDBFiles(str(d), use_native=True, **kw)
    fp = _MUSDBFiles(str(d), use_native=False, **kw)
    assert fn.banks and not fp.banks
    assert fn.lengths == fp.lengths
    for inst in ("drums", "bass"):
        sn = fn.sample_segments(np.random.default_rng(7), inst, 5, 8192)
        sp = fp.sample_segments(np.random.default_rng(7), inst, 5, 8192)
        np.testing.assert_array_equal(sn, sp)


def test_open_wav_bank_fallback_without_lib(tmp_path, monkeypatch, rng):
    """Without the native lib, open_wav_bank -> None and datasets fall back."""
    from music_mixing_style_transfer_tpu.data import native_loader
    from music_mixing_style_transfer_tpu.data.datasets import _MUSDBFiles

    monkeypatch.setattr(native_loader.native, "get_lib", lambda: None)
    p = str(tmp_path / "a.wav")
    write_wav(p, (rng.standard_normal((4000, 2)) * 0.1).astype(np.float32))
    assert native_loader.open_wav_bank([p]) is None

    d = tmp_path / "train"
    os.makedirs(d)
    write_wav(
        str(d / "vocals_normalized_eqcompimagegain_silence_trimmed0.wav"),
        (rng.standard_normal((20000, 2)) * 0.1).astype(np.float32),
    )
    files = _MUSDBFiles(str(d), instruments=("vocals",), use_native=True)
    assert not files.banks
    seg = files.sample_segments(np.random.default_rng(0), "vocals", 2, 4096)
    assert seg.shape == (2, 2, 4096) and np.isfinite(seg).all()


def test_wav_bank_input_validation(tmp_path, rng):
    p = str(tmp_path / "v.wav")
    write_wav(p, (rng.standard_normal((4000, 2)) * 0.1).astype(np.float32))
    bank = open_wav_bank([p])
    with pytest.raises(IndexError):
        bank.read_segments([1], [0], 128)
    with pytest.raises(ValueError):
        bank.read_segments([0], [-5], 128)
    with pytest.raises(ValueError):
        bank.read_segments([0], [0], 0)
    bank.close()
    with pytest.raises(ValueError):
        bank.read_segments([0], [0], 128)


def test_wav_bank_identifies_failing_file(tmp_path, rng):
    """A file truncated after bank creation is named in the IOError."""
    good = str(tmp_path / "good.wav")
    bad = str(tmp_path / "bad.wav")
    for p in (good, bad):
        write_wav(p, (rng.standard_normal((8000, 2)) * 0.1).astype(np.float32))
    bank = open_wav_bank([good, bad])
    with open(bad, "r+b") as f:
        f.truncate(64)  # keep the header, drop the data
    with pytest.raises(IOError, match="bad.wav"):
        bank.read_segments([0, 1], [0, 4000], 1024)
    bank.close()


def test_musdb_files_native_rejects_wrong_rate(tmp_path, rng):
    from music_mixing_style_transfer_tpu.data.datasets import _MUSDBFiles

    d = tmp_path / "train"
    os.makedirs(d)
    write_wav(
        str(d / "drums_normalized_eqcompimagegain_silence_trimmed0.wav"),
        (rng.standard_normal((20000, 2)) * 0.1).astype(np.float32),
        rate=48000,
    )
    with pytest.raises(ValueError, match="48000"):
        _MUSDBFiles(str(d), instruments=("drums",), use_native=True)


def test_compressor_attack_slower_than_release(rng):
    """attack > release flips which affine candidate is correct; the
    generalized min/max selection must still match the branchy reference
    loop (the C++ oracle) exactly."""
    from music_mixing_style_transfer_tpu.ops import compressor_process as jax_comp

    x = (rng.standard_normal(6000) * 0.5).astype(np.float32)
    y_native = native.compressor_process(x, -20.0, 200.0, 50.0, 6.0)
    y_jax = np.asarray(jax_comp(jnp.asarray(x), -20.0, 200.0, 50.0, 6.0, 0.0))
    np.testing.assert_allclose(y_native, y_jax, rtol=1e-3, atol=1e-4)

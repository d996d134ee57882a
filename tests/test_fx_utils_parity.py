"""Parity tests for the remaining ``fx_utils`` surface (reference
``mixing_manipulator/fx_utils.py``): slicing/overlap frame helpers,
highpass filtering, sox-style compand, and LUFS-normalize-with-compand."""
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from music_mixing_style_transfer_tpu.metrics import highpass_filtering
from music_mixing_style_transfer_tpu.ops import (
    compand,
    compand_transfer_table,
    integrated_loudness,
    lufs_normalize_compand,
    overlap,
    slicing,
)


def _ref_slicing(x, win, hop, center=True, windowing=False, pad=0):
    """Direct numpy re-statement of reference fx_utils.slicing (:164-179)."""
    if center:
        x = np.pad(x, ((int((win - hop + pad) // 2), int((win + hop + pad) // 2)),))
    n_frames = 1 + (len(x) - win) // hop
    frames = np.stack([x[i * hop : i * hop + win] for i in range(n_frames)])
    if windowing:
        frames = frames * scipy.signal.get_window("hann", win, fftbins=True)
    return frames.astype(np.float32)


def _ref_overlap(frames, x_len, win, hop, windowing=True, rate=1.0):
    """Direct numpy re-statement of reference fx_utils.overlap (:182-198)."""
    x = frames.reshape(frames.shape[0], frames.shape[1]).T
    if windowing:
        window = scipy.signal.get_window("hann", win, fftbins=True)
        rate = rate * hop / win
    else:
        window = 1.0
        rate = 1.0
    n_frames = x_len / hop
    expected = int(win + hop * n_frames)
    y = np.zeros(expected)
    for i in range(int(n_frames)):
        s = i * hop
        y[s : s + win] += x[:, i] * window
    y = y[win // 2 : -(win // 2)]
    return np.float32(y * rate)


def test_slicing_matches_reference_math(rng):
    x = rng.standard_normal(44100).astype(np.float32)
    for center in (True, False):
        for windowing in (True, False):
            got = np.asarray(slicing(x, 4096, 1024, center=center, windowing=windowing))
            want = _ref_slicing(x, 4096, 1024, center=center, windowing=windowing)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_overlap_matches_reference_math(rng):
    x = rng.standard_normal(32768).astype(np.float32)
    frames = _ref_slicing(x, 4096, 1024, center=True, windowing=True)
    got = np.asarray(overlap(jnp.asarray(frames), len(x), 4096, 1024))
    want = _ref_overlap(frames, len(x), 4096, 1024)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_slicing_overlap_roundtrip(rng):
    """Rectangular slicing -> hann overlap-add reconstructs the signal up to
    the analytic hop//2 shift (hann at hop=win/4 sums to 2; the rate*hop/win
    correction with rate=2 makes it unity)."""
    x = rng.standard_normal(16384).astype(np.float32)
    win, hop = 2048, 512
    frames = slicing(x, win, hop, center=True, windowing=False)
    y = np.asarray(overlap(frames, len(x), win, hop, windowing=True, rate=2.0))
    # frame i covers padded[i*hop : i*hop+win] with lpad=(win-hop)//2; the
    # final trim removes win//2, so y[j] ~ x[j + hop//2] in the interior
    shift = hop // 2
    core = slice(win, len(x) - 2 * win)
    np.testing.assert_allclose(y[core], x[shift + core.start : shift + core.stop], atol=5e-3)


def test_highpass_filtering_matches_scipy(rng):
    xs = [rng.standard_normal(8192).astype(np.float32) for _ in range(3)]
    got = highpass_filtering(xs, 100.0, 44100)
    b, a = scipy.signal.butter(4, 100.0 / 22050.0, "highpass")
    for g, x in zip(got, xs):
        np.testing.assert_allclose(g, scipy.signal.filtfilt(b, a, x), atol=1e-5)


def test_compand_transfer_table_curve():
    grid, table = compand_transfer_table()
    # unity below the first point: at -100 dB in, -100 dB out
    i = np.argmin(np.abs(grid + 100.0))
    assert abs(table[i] - (-100.0)) < 0.2
    # the (-0.1 -> -20) knot: 0 dB in maps to ~ -20..0 segment endpoint 0
    assert abs(table[-1] - 0.0) < 0.5
    i = np.argmin(np.abs(grid + 35.0))  # midpoint of the -70..-0.1 segment
    want = np.interp(-35.0, [-70.0, -0.1], [-70.0, -20.0])
    assert abs(table[i] - want) < 0.3
    # monotone non-decreasing
    assert np.all(np.diff(table) >= -1e-6)


def test_compand_gain_reduction_on_loud_signal(rng):
    sr = 44100
    t = np.arange(sr) / sr
    # steady loud tone at ~ -0.9 dB peak -> transfer maps toward -20 dB
    x = (0.9 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    x = np.stack([x, x])  # [2, T]
    y = np.asarray(compand(jnp.asarray(x), sample_rate=sr))
    peak_in = 20 * np.log10(np.max(np.abs(x)))
    peak_out = 20 * np.log10(np.max(np.abs(y[:, sr // 10 :])))
    assert peak_out < peak_in - 10.0, (peak_in, peak_out)
    # quiet signal (below -70 dB) passes ~unchanged
    xq = (1e-4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None].repeat(2, 0)
    yq = np.asarray(compand(jnp.asarray(xq), sample_rate=sr))
    ratio = np.max(np.abs(yq[:, sr // 10 :])) / np.max(np.abs(xq))
    assert 0.7 < ratio < 1.4, ratio


def test_lufs_normalize_compand_hits_target(rng):
    sr = 44100
    x = (0.3 * rng.standard_normal((2, 4 * sr))).astype(np.float32)
    y = lufs_normalize_compand(jnp.asarray(x), sr, -20.0)
    loud = float(integrated_loudness(y.T, sr))
    assert np.max(np.abs(np.asarray(y))) <= 1.0 + 1e-6
    assert abs(loud - (-20.0)) < 1.0, loud

"""Tests for evaluation metrics and time/pitch FX."""
import numpy as np
import pytest

import jax.numpy as jnp

from music_mixing_style_transfer_tpu import metrics as M

SR = 44100


def _tone(freq, seconds=1.0, amp=0.3):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mape_matches_definition():
    assert abs(M.mape([2.0, 4.0], [1.0, 5.0]) - (0.5 + 0.25) / 2) < 1e-9


def test_loudness_features_identity(rng):
    x = (rng.standard_normal((SR * 2, 2)) * 0.1).astype(np.float32)
    f = M.compute_loudness_features(x, x)
    assert f["d_lufs"][0] < 1e-6
    assert f["d_peak"][0] < 1e-6


def test_spectral_features_identity_and_sensitivity(rng):
    x = np.stack([_tone(440, 2.0), _tone(880, 2.0)], 1)
    f_same = M.compute_spectral_features(x, x)
    assert f_same["mape_mean"][0] < 1e-6
    # brighter signal -> nonzero distance
    y = np.stack([_tone(3000, 2.0), _tone(5000, 2.0)], 1)
    f_diff = M.compute_spectral_features(y, x)
    assert f_diff["centroid_mean"][0] > 0.1


def test_spectral_centroid_value():
    x = np.stack([_tone(1000, 1.0), _tone(1000, 1.0)], 1)
    S = M._stft_mag(x, 4096, 1024)[0]
    freqs = np.fft.rfftfreq(4096, 1 / SR)
    c = M.spectral_centroid(S, freqs)
    assert abs(np.median(c) - 1000) < 30


def test_panning_features(rng):
    noise = (rng.standard_normal(SR) * 0.2).astype(np.float32)
    centered = np.stack([noise, noise * 0.98 + 0.02 * rng.standard_normal(SR).astype(np.float32)], 1)
    panned = np.stack([noise * 1.6, noise * 0.4], 1)
    f_same = M.compute_panning_features(centered, centered)
    assert f_same["mape_mean"][0] < 1e-6
    f_diff = M.compute_panning_features(panned, centered)
    assert f_diff["mape_mean"][0] > f_same["mape_mean"][0]


def test_dynamic_features(rng):
    x = (rng.standard_normal((SR * 2, 2)) * 0.2).astype(np.float32)
    f = M.compute_dynamic_features(x, x)
    assert f["mape_mean"][0] < 1e-6
    y = np.tanh(x * 8) * 0.2  # heavily compressed
    f2 = M.compute_dynamic_features(y, x)
    assert f2["mape_mean"][0] > 0


def test_mel_filterbank_matches_librosa_shape():
    fb = M.mel_filterbank(SR, 1024, 128)
    assert fb.shape == (128, 513)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_mfcc_distance_identity_and_order(rng):
    x = _tone(440, 1.0) + 0.05 * rng.standard_normal(SR).astype(np.float32)
    d0 = M.mfcc_distances(x, x, SR)
    assert d0["mse"] < 1e-6
    y = _tone(660, 1.0) + 0.05 * rng.standard_normal(SR).astype(np.float32)
    d1 = M.mfcc_distances(x, y, SR)
    assert d1["mse"] > d0["mse"]


# --------------------------------------------------------------- time fx
def _dominant_freq(x, sr=SR):
    spec = np.abs(np.fft.rfft(np.asarray(x) * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[np.argmax(spec)]


def test_playback_speed_shifts_pitch():
    from music_mixing_style_transfer_tpu.ops.resample import playback_speed

    x = jnp.asarray(_tone(440, 1.0))
    y = np.asarray(playback_speed(x, 1.25))
    assert y.shape == x.shape
    # center region should contain 550 Hz
    assert abs(_dominant_freq(y[SR // 4 : 3 * SR // 4]) - 440 * 1.25) < 15


def test_pitch_shift_preserves_length_and_shifts():
    from music_mixing_style_transfer_tpu.ops.resample import pitch_shift

    x = jnp.asarray(_tone(440, 1.0))
    y = np.asarray(pitch_shift(x, 12.0))  # one octave up
    assert y.shape == x.shape
    assert abs(_dominant_freq(y[SR // 4 : 3 * SR // 4]) - 880) < 25


def test_time_stretch_preserves_pitch():
    from music_mixing_style_transfer_tpu.ops.resample import time_stretch

    x = jnp.asarray(_tone(440, 1.0))
    y = np.asarray(time_stretch(x, 1.3))
    assert y.shape == x.shape
    assert abs(_dominant_freq(y[SR // 4 : 3 * SR // 4]) - 440) < 15


def test_bend_runs(rng):
    from music_mixing_style_transfer_tpu.fx.timefx import Bend

    x = jnp.asarray(np.stack([_tone(440, 1.0), _tone(440, 1.0)]))
    b = Bend()
    p = b.sample_host(np.random.default_rng(0), x.shape[-1])
    y = np.asarray(b.apply(p, x))
    assert y.shape == x.shape
    assert np.isfinite(y).all()

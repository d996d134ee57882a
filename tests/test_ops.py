"""Numeric golden tests for core DSP ops against scipy/numpy oracles."""
import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.ops import (
    biquad_apply,
    biquad_apply_scan,
    compressor_process,
    compute_istft,
    compute_stft,
    fft_convolve_full,
    filtfilt_fir,
    fir_filter,
    frame,
    integrated_loudness,
    istft,
    lufs_normalize,
    magnitude,
    peak_normalize,
    rbj_coeffs,
    sqrt_hann_window,
    stft,
    hann_window,
)


# ----------------------------------------------------------------- STFT
def test_stft_center_false_matches_manual(rng):
    n_fft, hop = 256, 64
    x = rng.standard_normal(2048).astype(np.float32)
    win = sqrt_hann_window(n_fft)
    out = np.asarray(stft(jnp.asarray(x), n_fft, hop, win, center=False))
    n_frames = 1 + (len(x) - n_fft) // hop
    assert out.shape == (n_frames, n_fft // 2 + 1)
    for t in [0, 3, n_frames - 1]:
        seg = x[t * hop : t * hop + n_fft] * win
        ref = np.fft.rfft(seg)
        np.testing.assert_allclose(out[t], ref, rtol=1e-4, atol=1e-4)


def test_istft_roundtrip_center_false(rng):
    n_fft, hop = 256, 64
    x = rng.standard_normal(2048).astype(np.float32)
    win = sqrt_hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, win, center=False)
    y = np.asarray(istft(spec, hop, win, center=False))
    # interior perfectly reconstructed (edges lack overlap coverage)
    np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft : len(y) - n_fft], atol=1e-4)


def test_compute_stft_istft_channel_layout(rng):
    x = rng.standard_normal((4096, 2)).astype(np.float32)
    spec = compute_stft(jnp.asarray(x), 256, 1024)
    assert spec.shape[1] == 2  # frames x channels x bins
    y = np.asarray(compute_istft(spec, 256, 1024))
    assert y.shape[1] == 2
    np.testing.assert_allclose(y[1024:-1024, :], x[1024 : len(y) - 1024, :], atol=1e-4)


def test_stft_center_true_matches_torch(rng):
    import torch

    n_fft, hop = 512, 128
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    win = hann_window(n_fft, periodic=True)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, win, center=True))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.from_numpy(win),
        center=True,
        return_complex=True,
    ).numpy()  # [B, bins, frames]
    np.testing.assert_allclose(ours, np.swapaxes(ref, -1, -2), rtol=1e-3, atol=1e-3)


# ----------------------------------------------------------------- biquad
@pytest.mark.parametrize(
    "ftype,G,Q,fc",
    [
        ("low_shelf", 6.0, 0.707, 80.0),
        ("high_shelf", -50.0, 0.707, 100.0),
        ("peaking", 9.0, 0.7, 2000.0),
        ("high_pass", 0.0, 0.5, 38.0),
    ],
)
def test_biquad_matches_scipy_lfilter(rng, ftype, G, Q, fc):
    coeffs = np.asarray(rbj_coeffs(ftype, G, Q, fc, 44100.0))
    b = coeffs[:3]
    a = np.array([1.0, coeffs[3], coeffs[4]])
    x = rng.standard_normal(4000).astype(np.float32)
    ref = scipy.signal.lfilter(b, a, x)
    y_scan = np.asarray(biquad_apply_scan(jnp.asarray(x), jnp.asarray(coeffs)))
    y_par = np.asarray(biquad_apply(jnp.asarray(x), jnp.asarray(coeffs)))
    # float32 recursion drifts for near-DC poles; compare by normalized RMS error
    ref_rms = np.sqrt(np.mean(ref**2))
    assert np.sqrt(np.mean((y_scan - ref) ** 2)) / ref_rms < 2e-3
    assert np.sqrt(np.mean((y_par - ref) ** 2)) / ref_rms < 2e-3


def test_biquad_batched(rng):
    c1 = np.asarray(rbj_coeffs("peaking", 5.0, 1.0, 1000.0, 44100.0))
    c2 = np.asarray(rbj_coeffs("peaking", -5.0, 0.5, 4000.0, 44100.0))
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    coeffs = jnp.stack([jnp.asarray(c1), jnp.asarray(c2)])
    y = np.asarray(biquad_apply(jnp.asarray(x), coeffs))
    for i, c in enumerate([c1, c2]):
        ref = scipy.signal.lfilter(c[:3], [1.0, c[3], c[4]], x[i])
        np.testing.assert_allclose(y[i], ref, rtol=1e-3, atol=1e-4)


def test_fir_filter_and_filtfilt(rng):
    taps = scipy.signal.firwin(101, 0.3).astype(np.float32)
    x = rng.standard_normal(3000).astype(np.float32)
    ref_l = scipy.signal.lfilter(taps, 1.0, x)
    np.testing.assert_allclose(
        np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(taps))), ref_l, atol=1e-4
    )
    ref_ff = scipy.signal.filtfilt(taps, 1.0, x, padtype="odd")
    np.testing.assert_allclose(
        np.asarray(filtfilt_fir(jnp.asarray(x), jnp.asarray(taps))), ref_ff, atol=1e-3
    )


# ----------------------------------------------------------------- compressor
def _numpy_compressor(x, threshold, attack, release, ratio, makeup, sr):
    """Direct loop port of the documented envelope-follower semantics."""
    M = len(x)
    y_l = np.zeros(M)
    x_g = np.where(np.abs(x) < 1e-6, -120.0, 20 * np.log10(np.maximum(np.abs(x), 1e-12)))
    if ratio > 1:
        y_g = np.where(x_g >= threshold, threshold + (x_g - threshold) / ratio, x_g)
    elif ratio < 1:
        y_g = np.where(x_g <= threshold, threshold + (x_g - threshold) * ratio, x_g)
    else:
        y_g = x_g
    x_l = x_g - y_g
    aa = np.exp(-1 / (0.001 * sr * attack))
    ar = np.exp(-1 / (0.001 * sr * release))
    prev = 0.0
    for i in range(M):
        a = aa if x_l[i] > prev else ar
        y_l[i] = a * prev + (1 - a) * x_l[i]
        prev = y_l[i]
    c = 10.0 ** ((makeup - y_l) / 20.0)
    return x * c


@pytest.mark.parametrize("ratio", [4.0, 0.25])
def test_compressor_matches_loop(rng, ratio):
    sr = 44100
    x = (rng.standard_normal(8000) * 0.5).astype(np.float32)
    ref = _numpy_compressor(x.astype(np.float64), -20.0, 5.0, 100.0, ratio, 0.0, sr)
    out = np.asarray(
        compressor_process(jnp.asarray(x), -20.0, 5.0, 100.0, ratio, 0.0, sample_rate=sr)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_compressor_grid_broadcast(rng):
    """Grid sweep over (ratio, threshold) as a batch — the TPU-parallel
    replacement for the reference's sequential search loops."""
    sr = 44100
    x = (rng.standard_normal(2000) * 0.5).astype(np.float32)
    ths = np.linspace(-40, -10, 4).astype(np.float32)
    out = np.asarray(
        compressor_process(
            jnp.asarray(x)[None, :].repeat(4, 0),
            jnp.asarray(ths)[:, None] * jnp.ones((1, 1)),
            5.0,
            100.0,
            4.0,
            0.0,
            sample_rate=sr,
        )
    )
    for i, th in enumerate(ths):
        ref = _numpy_compressor(x.astype(np.float64), th, 5.0, 100.0, 4.0, 0.0, sr)
        np.testing.assert_allclose(out[i], ref, rtol=1e-3, atol=1e-4)


# ----------------------------------------------------------------- fft conv
def test_fft_convolve_full(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    h = rng.standard_normal(137).astype(np.float32)
    ref = np.convolve(x, h, mode="full")
    out = np.asarray(fft_convolve_full(jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(out, ref, atol=1e-3)


# ----------------------------------------------------------------- loudness
def _numpy_bs1770(x, rate):
    """Independent BS.1770-4 implementation for cross-checking."""
    if x.ndim == 1:
        x = x[:, None]
    G = np.array([1.0, 1.0, 1.0, 1.41, 1.41][: x.shape[1]])

    def rbj(ftype, Gd, Q, fc):
        A = 10 ** (Gd / 40)
        w0 = 2 * np.pi * fc / rate
        alpha = np.sin(w0) / (2 * Q)
        if ftype == "high_shelf":
            b = [
                A * ((A + 1) + (A - 1) * np.cos(w0) + 2 * np.sqrt(A) * alpha),
                -2 * A * ((A - 1) + (A + 1) * np.cos(w0)),
                A * ((A + 1) + (A - 1) * np.cos(w0) - 2 * np.sqrt(A) * alpha),
            ]
            a = [
                (A + 1) - (A - 1) * np.cos(w0) + 2 * np.sqrt(A) * alpha,
                2 * ((A - 1) - (A + 1) * np.cos(w0)),
                (A + 1) - (A - 1) * np.cos(w0) - 2 * np.sqrt(A) * alpha,
            ]
        else:  # high_pass
            b = [(1 + np.cos(w0)) / 2, -(1 + np.cos(w0)), (1 + np.cos(w0)) / 2]
            a = [1 + alpha, -2 * np.cos(w0), 1 - alpha]
        return np.array(b) / a[0], np.array(a) / a[0]

    y = x.copy().astype(np.float64)
    for ftype, Gd, Q, fc in [
        ("high_shelf", 4.0, 1 / np.sqrt(2), 1500.0),
        ("high_pass", 0.0, 0.5, 38.0),
    ]:
        b, a = rbj(ftype, Gd, Q, fc)
        y = scipy.signal.lfilter(b, a, y, axis=0)

    T_g, step = 0.4, 0.25
    T_total = x.shape[0] / rate
    num_blocks = int(round((T_total - T_g) / (T_g * step))) + 1
    z = np.zeros((x.shape[1], num_blocks))
    for j in range(num_blocks):
        lo = int(T_g * rate * j * step)
        hi = int(T_g * rate * (j * step + 1))
        z[:, j] = np.mean(y[lo:hi] ** 2, axis=0)
    l_j = -0.691 + 10 * np.log10(np.maximum((G[:, None] * z).sum(0), 1e-30))
    J = l_j > -70
    gamma_r = -0.691 + 10 * np.log10(np.maximum((G * z[:, J].mean(1)).sum(), 1e-30)) - 10
    J2 = J & (l_j > gamma_r)
    return -0.691 + 10 * np.log10(np.maximum((G * z[:, J2].mean(1)).sum(), 1e-30))


def test_integrated_loudness_matches_numpy(rng):
    rate = 44100
    t = np.arange(rate * 3) / rate
    x = (0.3 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    x = np.stack([x, x * 0.8], 1)
    # add a quiet section to exercise gating
    x[rate : rate + rate // 2] *= 0.001
    ref = _numpy_bs1770(x, rate)
    out = float(integrated_loudness(jnp.asarray(x), rate))
    assert abs(out - ref) < 0.02


def test_loudness_gain_linearity(rng):
    rate = 44100
    x = (rng.standard_normal((rate * 2, 2)) * 0.1).astype(np.float32)
    l1 = float(integrated_loudness(jnp.asarray(x), rate))
    l2 = float(integrated_loudness(jnp.asarray(x * 2.0), rate))
    assert abs((l2 - l1) - 20 * np.log10(2)) < 0.15


def test_lufs_normalize_hits_target(rng):
    rate = 44100
    x = (rng.standard_normal((rate * 2, 2)) * 0.05).astype(np.float32)
    y = np.asarray(lufs_normalize(jnp.asarray(x), rate, -25.0))
    out = float(integrated_loudness(jnp.asarray(y), rate))
    assert abs(out - (-25.0)) < 0.1


def test_biquad_fft_paths_match_lfilter(rng):
    """Spectral-cascade and truncated-IR paths == scipy lfilter on long audio."""
    from music_mixing_style_transfer_tpu.ops.biquad import (
        biquad_apply_fft,
        biquad_cascade_fft,
    )

    cs = np.stack(
        [
            np.asarray(rbj_coeffs("high_shelf", 4.0, 0.7071, 1500.0, 44100.0)),
            np.asarray(rbj_coeffs("high_pass", 0.0, 0.5, 38.0, 44100.0)),
        ]
    )
    x = (rng.standard_normal(100_000) * 0.3).astype(np.float32)
    ref = x.astype(np.float64)
    for c in cs:
        ref = scipy.signal.lfilter(c[:3], [1.0, c[3], c[4]], ref)

    y_fft = np.asarray(biquad_cascade_fft(jnp.asarray(x), jnp.asarray(cs)))
    nrmse = np.sqrt(np.mean((y_fft - ref) ** 2)) / np.sqrt(np.mean(ref**2))
    assert nrmse < 2e-3

    y_ir = np.asarray(biquad_apply_fft(jnp.asarray(x), jnp.asarray(cs[1])))
    ref1 = scipy.signal.lfilter(cs[1][:3], [1.0, cs[1][3], cs[1][4]], x)
    nrmse1 = np.sqrt(np.mean((y_ir - ref1) ** 2)) / np.sqrt(np.mean(ref1**2))
    assert nrmse1 < 2e-3

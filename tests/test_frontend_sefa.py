"""FrontEnd/BackEnd and SeFa tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.models.frontend import BackEnd, FrontEnd
from music_mixing_style_transfer_tpu.models.sefa import (
    film_edit_directions,
    sefa_per_block_conditions,
)


def test_frontend_mono_mag_shape(rng):
    fe = FrontEnd(channel="mono", n_fft=512, hop_length=128)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    out = fe(x, mode=["mag"])
    # mag drops DC -> 256 bins; T % (n_fft/4) == 0 -> last frame trimmed
    assert out.shape == (2, 1, 256, 4096 // 128)


def test_frontend_stereo_cplx_and_combined(rng):
    fe = FrontEnd(channel="stereo", n_fft=512, hop_length=128)
    x = jnp.asarray(rng.standard_normal((2, 2, 4100)).astype(np.float32))
    c = fe(x, mode=["cplx"])
    assert c.shape[1] == 4  # re/im x 2 channels
    assert c.shape[2] == 256  # Nyquist dropped
    both = fe(x, mode=["cplx", "mag"])
    assert both.shape[1] == 6


def test_backend_cplx_roundtrip(rng):
    n_fft, hop = 512, 128
    fe = FrontEnd(channel="mono", n_fft=n_fft, hop_length=hop)
    be = BackEnd(channel="mono", n_fft=n_fft, hop_length=hop)
    x = jnp.asarray((rng.standard_normal((1, 4100)) * 0.3).astype(np.float32))
    feats = fe(x, mode=["cplx"])
    y = np.asarray(be.cplx_to_wave(feats))[0, 0]
    # reconstruction is lossy only through the zeroed Nyquist bin (the
    # reference drops it and pads zeros back, front_back_end.py:44,124-126):
    # for white noise that's ~1/257 of the energy
    ref = np.asarray(x)[0]
    n = min(len(ref), len(y))
    err = np.sqrt(np.mean((y[hop : n - n_fft] - ref[hop : n - n_fft]) ** 2))
    assert err < 0.02
    assert np.corrcoef(y[:n], ref[:n])[0, 1] > 0.999


def test_griffin_lim_reconstructs_tone():
    sr = 8192
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    be = BackEnd(channel="mono", n_fft=512, hop_length=128)
    from music_mixing_style_transfer_tpu.ops.stft import hann_window, stft, magnitude

    spec = stft(jnp.asarray(x[None]), 512, 128, hann_window(512), center=True)
    mag = magnitude(jnp.swapaxes(spec, -1, -2))
    y = np.asarray(be.griffin_lim(mag, n_iter=16))[0]
    # dominant frequency preserved
    w = np.abs(np.fft.rfft(y[500:5000] * np.hanning(4500)))
    f = np.fft.rfftfreq(4500, 1 / sr)[np.argmax(w)]
    assert abs(f - 440) < 10


def test_sefa_directions_orthonormal(rng):
    film = {"weight": rng.standard_normal((32, 64)).astype(np.float32)}
    vals, vecs = film_edit_directions(film)
    assert vals.shape == (64,)
    assert np.all(np.diff(vals) <= 1e-6)  # descending
    np.testing.assert_allclose(vecs @ vecs.T, np.eye(64), atol=1e-4)


def test_sefa_per_block_edit_changes_output(rng):
    from music_mixing_style_transfer_tpu.config import TCNConfig
    from music_mixing_style_transfer_tpu.models import MixFXcloner

    cfg = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=7)
    tcn = MixFXcloner(config=cfg)
    v = tcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 1024)), jnp.zeros((1, 16)))
    cond = rng.standard_normal(16).astype(np.float32)
    x = jnp.asarray((rng.standard_normal((1, 2, 1024)) * 0.2).astype(np.float32))

    conds = sefa_per_block_conditions(cond, v["params"], {1: (0, 5.0)}, n_blocks=2)
    base = tcn.apply(v, x, jnp.asarray(cond)[None])
    edited = tcn.apply(v, x, [jnp.asarray(c)[None] for c in conds])
    assert not np.allclose(np.asarray(base), np.asarray(edited))


def test_backend_mag_phase_roundtrip(rng):
    n_fft, hop = 512, 128
    be = BackEnd(channel="stereo", n_fft=n_fft, hop_length=hop)
    from music_mixing_style_transfer_tpu.ops.stft import hann_window, stft

    x = jnp.asarray((rng.standard_normal((1, 2, 4100)) * 0.3).astype(np.float32))
    win = hann_window(n_fft)
    spec_l = stft(x[:, 0], n_fft, hop, win, center=True)
    spec_r = stft(x[:, 1], n_fft, hop, win, center=True)
    mag = jnp.stack(
        [jnp.abs(jnp.swapaxes(spec_l, -1, -2)), jnp.abs(jnp.swapaxes(spec_r, -1, -2))], 1
    )[:, :, 1:]  # drop DC like FrontEnd's mag mode (frontend.py:75)
    ph = jnp.stack(
        [jnp.angle(jnp.swapaxes(spec_l, -1, -2)), jnp.angle(jnp.swapaxes(spec_r, -1, -2))], 1
    )[:, :, 1:]
    y = np.asarray(be.mag_phase_to_wave(mag, ph))
    ref = np.asarray(x)
    n = min(ref.shape[-1], y.shape[-1])
    err = np.sqrt(np.mean((y[..., hop : n - n_fft] - ref[..., hop : n - n_fft]) ** 2))
    assert err < 0.02  # DC-zeroing loss only


def test_frontend_hamming_window(rng):
    fe = FrontEnd(channel="mono", n_fft=256, hop_length=64, window="hamming")
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
    out = fe(x, mode=["mag"])
    assert np.isfinite(np.asarray(out)).all()

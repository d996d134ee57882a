"""Resampling and phase-vocoder time/pitch manipulation.

TPU-native replacements for the reference's libsox-backed processors
(``common_audioeffects.py``: PitchShift :1132-1199, TimeStretch :1203-1279,
PlaybackSpeed :1283-1347, Bend :1351-1422 — none of which are in the default
training chains, SURVEY.md §2.1):

- ``sinc_resample``: windowed-sinc interpolation with anti-aliasing low-pass
  for downsampling (gather + small matmul — fully parallel).
- ``phase_vocoder``: STFT phase-vocoder time stretching (phase accumulation
  is a short ``lax.scan`` over frames).
- ``pitch_shift``: time stretch + playback-speed resample.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stft import hann_window, istft, stft


@partial(jax.jit, static_argnames=("out_len", "width"))
def sinc_resample(x: jnp.ndarray, factor: float, out_len: int, width: int = 32) -> jnp.ndarray:
    """Evaluate ``y[n] = x(n * factor)`` with windowed-sinc interpolation.

    ``x [..., T]`` -> ``[..., out_len]``. ``factor > 1`` plays faster
    (sox ``speed``): the kernel cutoff is lowered to anti-alias.
    """
    T = x.shape[-1]
    t = jnp.arange(out_len) * factor
    i0 = jnp.floor(t).astype(jnp.int32)
    frac = t - i0

    cutoff = jnp.minimum(1.0, 1.0 / factor) * 0.98
    j = jnp.arange(-width, width + 1, dtype=jnp.float32)  # [K]
    arg = j[None, :] - frac[:, None]  # [out_len, K]
    kernel = cutoff * jnp.sinc(cutoff * arg)
    win = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(arg / width, -1.0, 1.0))
    kernel = kernel * win

    idx = jnp.clip(i0[:, None] + j[None, :].astype(jnp.int32), 0, T - 1)  # [out_len, K]
    gathered = x[..., idx]  # [..., out_len, K]
    return jnp.sum(gathered * kernel, axis=-1)


def playback_speed(x: jnp.ndarray, factor: float, fix_length: bool = True) -> jnp.ndarray:
    """sox ``speed``: change rate (duration AND pitch) by ``factor``.

    With ``fix_length`` the output is center-cropped / center-padded back to
    the input length (reference fix_length handling :1336-1345).
    """
    T = x.shape[-1]
    out_len = int(round(T / factor))
    y = sinc_resample(x, float(factor), out_len)
    if not fix_length:
        return y
    return _fix_length(y, T)


def _fix_length(y: jnp.ndarray, T: int) -> jnp.ndarray:
    L = y.shape[-1]
    if L > T:
        i0 = (L - T) // 2
        return y[..., i0 : i0 + T]
    if L < T:
        pad = T - L
        return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad // 2, pad - pad // 2)])
    return y


def phase_vocoder(
    x: jnp.ndarray, rate: float, n_fft: int = 2048, hop: int = 512
) -> jnp.ndarray:
    """Time-stretch ``x [..., T]`` by ``rate`` (>1 = faster/shorter) with a
    hann phase vocoder. Output length ~ T/rate."""
    win = hann_window(n_fft, periodic=True)
    D = stft(x, n_fft, hop, win, center=True)  # [..., F, bins]
    n_frames = D.shape[-2]

    steps = jnp.arange(0, n_frames - 1, rate)
    lo = jnp.floor(steps).astype(jnp.int32)
    frac = (steps - lo)[:, None]

    mag_lo = jnp.abs(D[..., lo, :])
    mag_hi = jnp.abs(D[..., lo + 1, :])
    mag = (1 - frac) * mag_lo + frac * mag_hi

    phase = jnp.angle(D)
    phi_adv = (2.0 * jnp.pi * hop / n_fft) * jnp.arange(D.shape[-1])

    dphase = phase[..., lo + 1, :] - phase[..., lo, :] - phi_adv
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    inc = phi_adv + dphase  # [..., S, bins]

    phase0 = phase[..., 0, :]
    # accumulated output phase: phi[s] = phi0 + sum_{u<s} inc[u]
    inc_m = jnp.moveaxis(inc, -2, 0)
    csum = jnp.cumsum(inc_m, axis=0)
    csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum[:-1]], axis=0)
    phase_acc = jnp.moveaxis(phase0[None] + csum, 0, -2)

    D_new = mag * jnp.exp(1j * phase_acc)
    return istft(D_new, hop, win, center=True)


def time_stretch(x: jnp.ndarray, factor: float, fix_length: bool = True) -> jnp.ndarray:
    """sox ``tempo``: change duration (not pitch) by 1/factor
    (factor > 1 = faster)."""
    T = x.shape[-1]
    y = phase_vocoder(x, factor)
    return _fix_length(y, T) if fix_length else y


def pitch_shift(x: jnp.ndarray, semitones: float, fix_length: bool = True) -> jnp.ndarray:
    """sox ``pitch``: shift pitch, preserve duration: phase-vocoder stretch
    by 1/f then playback-speed by f with f = 2^(semitones/12)."""
    f = 2.0 ** (semitones / 12.0)
    stretched = phase_vocoder(x, 1.0 / f)  # duration ~ T*f, pitch unchanged
    out_len = int(round(stretched.shape[-1] / f))
    y = sinc_resample(stretched, float(f), out_len)
    return _fix_length(y, x.shape[-1]) if fix_length else y


def bend(
    x: jnp.ndarray,
    boundaries: np.ndarray,
    cents: np.ndarray,
) -> jnp.ndarray:
    """sox ``bend``: pitch-shift successive segments by the given cents
    (host-orchestrated over the few segments; each shift is on-device).
    ``boundaries`` are SAMPLE indices into the last axis (callers emulating
    sox's seconds-based positions convert with their own sample rate)."""
    T = x.shape[-1]
    bounds = [0] + [int(b) for b in boundaries] + [T]
    parts = []
    for i in range(len(bounds) - 1):
        seg = x[..., bounds[i] : bounds[i + 1]]
        if seg.shape[-1] < 4096 or cents[i] == 0:
            parts.append(seg)
        else:
            parts.append(pitch_shift(seg, float(cents[i]) / 100.0))
    return jnp.concatenate(parts, axis=-1)

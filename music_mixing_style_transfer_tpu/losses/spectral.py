"""Multi-scale mid/side spectral loss + RMS gain loss.

TPU re-design of the reference losses (``modules/loss.py:77-213``) and their
STFT front-end (``modules/front_back_end.py:9-82``):

- ``frontend_mag``: torch.stft-compatible magnitude features (center=True
  reflect pad, periodic Hann, DC bin dropped, trailing frame trimmed when
  ``T % (n_fft//4) == 0`` — reproducing FrontEnd's slicing).
- ``multiscale_spectral_midside``: DDSP-style multi-resolution loss on
  mid/side channels, 4 scales (4096/2048/1024/512, hops /4), weights
  0.9*L1(mag) + 0.1*L2(log10 mag), mid weight 0.5.
- ``rms_loss``: nonlinearly-weighted RMS (gain supervision).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, magnitude, stft


def frontend_mag(x: jnp.ndarray, n_fft: int, hop_length: int, eps: float = 1e-7) -> jnp.ndarray:
    """Magnitude STFT features of mono batch ``[B, T]`` -> ``[B, bins-1, F]``.

    Matches reference FrontEnd(channel='mono', mode=['mag']): torch.stft
    center=True + hann periodic; drops the DC bin; trims the final frame when
    ``T % round(n_fft/4) == 0`` (``front_back_end.py:48-62``).
    """
    win = hann_window(n_fft, periodic=True)
    spec = stft(x, n_fft, hop_length, win, center=True, pad_mode="reflect")
    mag = magnitude(spec, eps=eps)  # [B, F, bins]
    mag = jnp.swapaxes(mag, -1, -2)  # [B, bins, F]
    if x.shape[-1] % round(n_fft / 4) == 0:
        mag = mag[..., :-1]
    if n_fft % 2 == 0:
        mag = mag[:, 1:]
    return mag


def _mag_loss(est: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    # reference: torch.norm(L1Loss(est, tgt)) == |mean abs diff|
    return jnp.abs(jnp.mean(jnp.abs(est - tgt)))


def _logmag_loss(est: jnp.ndarray, tgt: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.mean(
        (jnp.log10(est + eps) - jnp.log10(tgt + eps)) ** 2
    )


@partial(jax.jit, static_argnames=("fft_sizes", "hop_sizes"))
def multiscale_spectral_midside(
    est: jnp.ndarray,
    tgt: jnp.ndarray,
    fft_sizes: Tuple[int, ...] = (4096, 2048, 1024, 512),
    hop_sizes: Tuple[int, ...] = (1024, 512, 256, 128),
    mid_weight: float = 0.5,
    logmag_weight: float = 0.1,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Multi-scale DDSP spectral loss on mid/side of stereo ``[B, 2, T]``.

    Reference ``MultiScale_Spectral_Loss_MidSide_DDSP`` (``loss.py:99-213``);
    mid = L + R, side = L - R (``loss.py:200-203``).
    """
    est_mid, est_side = est[:, 0] + est[:, 1], est[:, 0] - est[:, 1]
    tgt_mid, tgt_side = tgt[:, 0] + tgt[:, 1], tgt[:, 0] - tgt[:, 1]

    total_mag = 0.0
    total_logmag = 0.0
    for n_fft, hop in zip(fft_sizes, hop_sizes):
        em = frontend_mag(est_mid, n_fft, hop, eps)
        es = frontend_mag(est_side, n_fft, hop, eps)
        tm = frontend_mag(tgt_mid, n_fft, hop, eps)
        ts = frontend_mag(tgt_side, n_fft, hop, eps)
        total_mag = total_mag + mid_weight * _mag_loss(em, tm) + (1 - mid_weight) * _mag_loss(es, ts)
        total_logmag = (
            total_logmag
            + mid_weight * _logmag_loss(em, tm, eps)
            + (1 - mid_weight) * _logmag_loss(es, ts, eps)
        )
    return (1 - logmag_weight) * total_mag + logmag_weight * total_logmag


@partial(jax.jit, static_argnames=("fft_sizes", "hop_sizes"))
def multiscale_spectral_stereo(
    est: jnp.ndarray,
    tgt: jnp.ndarray,
    fft_sizes: Tuple[int, ...] = (4096, 2048, 1024, 512),
    hop_sizes: Tuple[int, ...] = (1024, 512, 256, 128),
    logmag_weight: float = 0.1,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Multi-scale spectral loss on raw L/R channels of stereo ``[B, 2, T]``.

    The reference's ``mode='ori'`` branch (``loss.py:154-177``,
    FrontEnd(channel='stereo')): per-channel magnitude L1 + log-magnitude L2
    over the same 4 scales, no mid/side transform. Unlike the mid/side mode,
    this term *sees* a static L/R imbalance — mid/side magnitudes cannot
    distinguish random-pan side content from ``side ≈ -α·mid`` (a constant
    channel bias), which is exactly the pathology the round-4/5 converter
    exhibited (panning-spectrum metrics are functions of per-channel
    magnitudes only, ``metrics.py:get_sps``).
    """
    B = est.shape[0]
    est_lr = est.reshape(B * 2, est.shape[-1])
    tgt_lr = tgt.reshape(B * 2, tgt.shape[-1])
    total_mag = 0.0
    total_logmag = 0.0
    for n_fft, hop in zip(fft_sizes, hop_sizes):
        em = frontend_mag(est_lr, n_fft, hop, eps)
        tm = frontend_mag(tgt_lr, n_fft, hop, eps)
        total_mag = total_mag + _mag_loss(em, tm)
        total_logmag = total_logmag + _logmag_loss(em, tm, eps)
    return (1 - logmag_weight) * total_mag + logmag_weight * total_logmag


@jax.jit
def rms_loss(est: jnp.ndarray, tgt: jnp.ndarray, weight_factor: float = 100.0) -> jnp.ndarray:
    """RMS gain loss (reference ``RMSLoss``, ``loss.py:77-93``).

    Faithful to the reference reduction: the elementwise MSE collapses to a
    scalar mean before the nonlinear weight is applied.
    """
    e = est.reshape(-1, est.shape[-1])
    t = tgt.reshape(-1, tgt.shape[-1])
    rms_e = jnp.sqrt(jnp.mean(e**2, axis=-1))
    rms_t = jnp.sqrt(jnp.mean(t**2, axis=-1))
    weight = jnp.clip(jnp.abs(rms_t - rms_e), min=1.0 / weight_factor) * weight_factor
    mse = jnp.mean((rms_e - rms_t) ** 2)
    return jnp.mean(weight**1.5 * mse)

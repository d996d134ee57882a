"""STFT / iSTFT primitives for TPU.

Two framing conventions are required for parity with the reference system:

- ``stft`` with ``center=False`` and a sqrt-Hann *symmetric* window: used by
  the FX-normalization DSP (reference ``common_miscellaneous.py:50-104``
  via librosa, and ``utils_data_normalization.py``).
- ``stft`` with ``center=True`` (reflect pad) and a *periodic* Hann window:
  torch.stft semantics used by the loss FrontEnd
  (reference ``modules/front_back_end.py:9-82``).

Everything is pure jnp — batched, jittable, differentiable. FFTs map to XLA's
TPU FFT; framing is a gather; overlap-add is a scatter-add.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# windows (host-side numpy; tiny, computed once per trace)
# --------------------------------------------------------------------------
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window. ``periodic=True`` matches torch.hann_window default;
    ``periodic=False`` the symmetric np.hanning."""
    n = win_length if periodic else win_length - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / max(n, 1))
    return w.astype(np.float32)


def hamming_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(win_length) / max(n, 1))
    return w.astype(np.float32)


def sqrt_hann_window(n_fft: int) -> np.ndarray:
    """``np.sqrt(np.hanning(n_fft+1)[:-1])`` — the analysis window used by the
    reference normalization DSP (``utils_data_normalization.py:76``)."""
    return np.sqrt(np.hanning(n_fft + 1)[:-1]).astype(np.float32)


# --------------------------------------------------------------------------
# framing
# --------------------------------------------------------------------------
def frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Split the last axis into overlapping frames.

    ``[..., T] -> [..., n_frames, frame_length]`` with
    ``n_frames = 1 + (T - frame_length) // hop_length``.

    Indices are built from on-device iota (a numpy index matrix would embed a
    multi-MB constant in the HLO — large programs choke remote compilation).
    """
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    )
    return x[..., idx]


# --------------------------------------------------------------------------
# STFT
# --------------------------------------------------------------------------
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = False,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Short-time Fourier transform over the last axis.

    Args:
        x: ``[..., T]`` real signal.
        window: analysis window of length ``win_length <= n_fft`` (zero-padded
            centered if shorter, matching torch.stft).
        center: if True, reflect-pad by ``n_fft//2`` first (torch/librosa
            ``center=True``); if False, frames start at sample 0 (librosa
            ``center=False``).

    Returns:
        complex64 ``[..., n_frames, n_fft//2 + 1]``.
    """
    win_length = len(window)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    w = jnp.asarray(window, dtype=x.dtype)

    if center:
        pad = n_fft // 2
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode
        )
    frames = frame(x, n_fft, hop_length)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def istft(
    spec: jnp.ndarray,
    hop_length: int,
    window: np.ndarray,
    center: bool = False,
    length: Optional[int] = None,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Inverse STFT with squared-window overlap-add normalization.

    Args:
        spec: complex ``[..., n_frames, n_bins]`` with ``n_bins = n_fft//2+1``.

    Returns:
        ``[..., T]`` real signal, librosa/torch-compatible for the matching
        ``center`` convention.
    """
    n_bins = spec.shape[-1]
    n_fft = 2 * (n_bins - 1)
    n_frames = spec.shape[-2]
    w = jnp.asarray(window, dtype=jnp.float32)
    if len(window) < n_fft:
        lpad = (n_fft - len(window)) // 2
        w = jnp.pad(w, (lpad, n_fft - len(window) - lpad))

    frames_t = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w  # [..., n_frames, n_fft]
    T_full = n_fft + hop_length * (n_frames - 1)

    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    flat_idx = idx.reshape(-1)

    batch_shape = spec.shape[:-2]
    frames_flat = frames_t.reshape(batch_shape + (-1,))
    y = jnp.zeros(batch_shape + (T_full,), dtype=frames_t.dtype)
    y = y.at[..., flat_idx].add(frames_flat)

    wsq = jnp.zeros(T_full).at[flat_idx].add(jnp.tile(w * w, n_frames))
    y = y / jnp.maximum(wsq, eps)

    if center:
        y = y[..., n_fft // 2 : T_full - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


def magnitude(spec: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """``sqrt(|S|^2 + eps)`` — matches the FrontEnd.mag epsilon handling
    (reference ``front_back_end.py:80-82``)."""
    return jnp.sqrt(spec.real**2 + spec.imag**2 + eps)


# --------------------------------------------------------------------------
# reference-normalization STFT pair (librosa center=False, sqrt-hann)
# --------------------------------------------------------------------------
def compute_stft(samples: jnp.ndarray, hop_length: int, fft_size: int) -> jnp.ndarray:
    """``[T, C] -> [n_frames, C, n_bins]`` complex, sqrt-hann, center=False.

    Drop-in equivalent of reference ``common_miscellaneous.py:50-77``.
    """
    win = sqrt_hann_window(fft_size)
    spec = stft(samples.T, fft_size, hop_length, win, center=False)  # [C, F, B]
    return jnp.moveaxis(spec, 0, 1)  # [F, C, B]


def compute_istft(spec: jnp.ndarray, hop_length: int, fft_size: int, length: Optional[int] = None) -> jnp.ndarray:
    """``[n_frames, C, n_bins] -> [T, C]``; inverse of :func:`compute_stft`
    (reference ``common_miscellaneous.py:80-104``)."""
    win = sqrt_hann_window(fft_size)
    y = istft(jnp.moveaxis(spec, 1, 0), hop_length, win, center=False, length=length)
    return y.T


def slicing(
    x: jnp.ndarray,
    win_length: int,
    hop_length: int,
    center: bool = True,
    windowing: bool = False,
    pad: int = 0,
) -> jnp.ndarray:
    """Frame a 1-D signal into ``[n_frames, win_length]`` windows — drop-in
    for reference ``fx_utils.slicing`` (:164-179), including its asymmetric
    center padding (left ``(win-hop+pad)//2``, right ``(win+hop+pad)//2``)
    and periodic-hann windowing."""
    x = jnp.asarray(x)
    if center:
        lpad = int((win_length - hop_length + pad) // 2)
        rpad = int((win_length + hop_length + pad) // 2)
        x = jnp.pad(x, (lpad, rpad))
    frames = frame(x, win_length, hop_length)  # [n_frames, win]
    if windowing:
        frames = frames * jnp.asarray(hann_window(win_length, periodic=True))
    return frames.astype(jnp.float32)


def overlap(
    frames: jnp.ndarray,
    x_len: int,
    win_length: int,
    hop_length: int,
    windowing: bool = True,
    rate: float = 1.0,
) -> jnp.ndarray:
    """Overlap-add ``[n_frames, win_length]`` frames back to a signal —
    drop-in for reference ``fx_utils.overlap`` (:182-198): hann re-windowing
    with ``rate * hop/win`` amplitude correction, OLA over ``x_len//hop``
    frames, then trim ``win//2`` from both ends."""
    frames = jnp.asarray(frames).reshape(frames.shape[0], frames.shape[1])
    if windowing:
        w = jnp.asarray(hann_window(win_length, periodic=True))
        rate = rate * hop_length / win_length
    else:
        w = jnp.ones((win_length,), jnp.float32)
        rate = 1.0
    n_frames = int(x_len / hop_length)
    n_frames = min(n_frames, frames.shape[0])
    expected_len = int(win_length + hop_length * (x_len / hop_length))
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(win_length, dtype=jnp.int32)[None, :]
    )
    y = jnp.zeros((expected_len,), frames.dtype)
    y = y.at[idx.reshape(-1)].add((frames[:n_frames] * w).reshape(-1))
    y = y[win_length // 2 : -(win_length // 2)]
    return (y * rate).astype(jnp.float32)

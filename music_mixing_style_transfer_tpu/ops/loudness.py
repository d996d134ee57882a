"""ITU-R BS.1770-4 loudness metering and normalization in pure JAX.

Replaces the reference's pyloudnorm dependency (``fx_utils.py:220-238``,
``utils_data_normalization.py:483-507``):

- K-weighting pre-filter: RBJ high-shelf (+4 dB @ 1500 Hz, Q=1/sqrt(2)) then
  high-pass (38 Hz, Q=0.5), per channel.
- 400 ms gating blocks with 75% overlap; absolute gate -70 LUFS; relative
  gate (mean - 10 LU); integrated loudness over surviving blocks.

Gating uses masked reductions (static shapes, jit-friendly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .biquad import biquad_apply, rbj_coeffs, rbj_poles
from .stft import frame


def k_weighting_coeffs(rate: float):
    """(high_shelf, high_pass) biquad (coeffs, poles) for sample rate."""
    shelf_args = ("high_shelf", 4.0, 1.0 / np.sqrt(2.0), 1500.0, rate)
    hpf_args = ("high_pass", 0.0, 0.5, 38.0, rate)
    return (
        (rbj_coeffs(*shelf_args), rbj_poles(*shelf_args)),
        (rbj_coeffs(*hpf_args), rbj_poles(*hpf_args)),
    )


def k_weight(x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Apply the two-stage K pre-filter over the last axis.

    Long signals use the spectral cascade evaluation (one FFT round trip;
    the recurrence form's O(T log T) associative scan is slow to compile and
    run at song lengths); short signals use the scan (exact transients)."""
    (sc, sp), (hc, hp) = k_weighting_coeffs(rate)
    if x.shape[-1] >= 65536:
        from .biquad import biquad_cascade_fft

        return biquad_cascade_fft(x, jnp.stack([sc, hc]))
    return biquad_apply(biquad_apply(x, sc, poles=sp), hc, poles=hp)


@partial(jax.jit, static_argnames=("rate",))
def integrated_loudness(x: jnp.ndarray, rate: int = 44100) -> jnp.ndarray:
    """Integrated (gated) loudness in LUFS.

    Args:
        x: ``[T]`` mono or ``[T, C]`` multi-channel (pyloudnorm layout).

    Returns:
        scalar LUFS. Returns -inf for fully-gated (silent) input.
    """
    if x.ndim == 1:
        x = x[:, None]
    C = x.shape[1]
    G = jnp.asarray([1.0, 1.0, 1.0, 1.41, 1.41][:C])

    y = k_weight(x.T, rate)  # [C, T]

    T_g = 0.4
    step = 0.25  # fraction of T_g (75% overlap)
    block_len = int(T_g * rate)
    hop = int(T_g * rate * step)
    # pyloudnorm: numBlocks = round((T_total - T_g)/(T_g*step)) + 1
    T_total = x.shape[0] / rate
    num_blocks = int(round((T_total - T_g) / (T_g * step))) + 1
    num_blocks = max(num_blocks, 0)
    if num_blocks == 0:
        return jnp.asarray(-jnp.inf)

    usable = hop * (num_blocks - 1) + block_len
    if usable > y.shape[-1]:
        y = jnp.pad(y, ((0, 0), (0, usable - y.shape[-1])))
    if block_len == 4 * hop:
        # 75% overlap means each 400 ms block is exactly 4 consecutive 100 ms
        # hop chunks — build block mean-squares from non-overlapped partial
        # sums (one pass over the audio) instead of a 4x-overlapping gather
        n_hops = usable // hop  # == num_blocks + 3
        psum = jnp.sum(
            y[..., : n_hops * hop].reshape(y.shape[0], n_hops, hop) ** 2, axis=-1
        )  # [C, J+3]
        z = (psum[:, :-3] + psum[:, 1:-2] + psum[:, 2:-1] + psum[:, 3:]) / block_len
    else:  # int() rounding broke the 4:1 ratio (non-standard rate)
        frames_ = frame(y[..., :usable], block_len, hop)  # [C, J, block]
        z = jnp.mean(frames_**2, axis=-1)  # [C, J] mean square per block

    l_j = -0.691 + 10.0 * jnp.log10(jnp.maximum(jnp.sum(G[:, None] * z, axis=0), 1e-30))

    abs_mask = l_j > -70.0
    n_abs = jnp.maximum(jnp.sum(abs_mask), 1)
    z_avg_abs = jnp.sum(jnp.where(abs_mask[None, :], z, 0.0), axis=1) / n_abs
    gamma_r = -0.691 + 10.0 * jnp.log10(jnp.maximum(jnp.sum(G * z_avg_abs), 1e-30)) - 10.0

    mask = abs_mask & (l_j > gamma_r)
    n_rel = jnp.sum(mask)
    z_avg = jnp.sum(jnp.where(mask[None, :], z, 0.0), axis=1) / jnp.maximum(n_rel, 1)
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(jnp.sum(G * z_avg), 1e-30))
    return jnp.where(n_rel > 0, lufs, -jnp.inf)


def loudness_normalize(x: jnp.ndarray, input_lufs, target_lufs) -> jnp.ndarray:
    """pyloudnorm.normalize.loudness: pure gain to hit the target."""
    gain = jnp.power(10.0, (target_lufs - input_lufs) / 20.0)
    return x * gain


def peak_normalize(x: jnp.ndarray, target_db: float) -> jnp.ndarray:
    """pyloudnorm.normalize.peak: scale so max |x| hits target dBFS."""
    peak = jnp.max(jnp.abs(x))
    gain = jnp.power(10.0, target_db / 20.0) / jnp.maximum(peak, 1e-30)
    return x * gain


def lufs_normalize(x: jnp.ndarray, rate: int, target_lufs) -> jnp.ndarray:
    """Reference ``fx_utils.lufs_normalize``: measure -> gain to target ->
    divide by max(1, peak) to protect against clipping."""
    loud = integrated_loudness(x + 1e-10, rate)
    # fully-gated input measures -inf LUFS -> the gain would be inf/NaN
    # (pyloudnorm NaNs here); pass such audio through unchanged instead
    y = jnp.where(jnp.isfinite(loud), loudness_normalize(x, loud, target_lufs), x)
    maxabs = jnp.maximum(1.0, 1e-6 + jnp.max(jnp.abs(y)))
    return y / maxabs


def lufs_normalize_compand(x: jnp.ndarray, rate: int, target_lufs) -> jnp.ndarray:
    """Reference ``fx_utils.lufs_normalize_compand`` (:240-263): sox compand
    (attack 1 ms, decay 10 ms, knee 1 dB, curve (-70,-70)/(-0.1,-20)/(0,0))
    followed by BS.1770 loudness normalization with peak protection.

    ``x``: ``[C, T]`` channel-first (the fx-ops convention; the reference
    operates on ``[T, C]`` — loudness is measured on the transpose)."""
    from .compressor import compand

    y = compand(x, attack_s=0.001, decay_s=0.01,
                tf_points=((-70.0, -70.0), (-0.1, -20.0), (0.0, 0.0)),
                soft_knee_db=1.0, sample_rate=rate)
    loud = integrated_loudness(y.T + 1e-10, rate)
    # fully-gated (silent) input measures -inf LUFS; the reference chain
    # (pyloudnorm) NaNs there — pass silence through unchanged instead
    y = jnp.where(jnp.isfinite(loud), loudness_normalize(y, loud, target_lufs), y)
    maxabs = jnp.maximum(1.0, 1e-6 + jnp.max(jnp.abs(y)))
    return y / maxabs

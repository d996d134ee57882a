"""RBJ-cookbook biquad filters as TPU-parallel scans.

Re-designs the reference's IIR surface (pymixconsole ``IIRfilter`` biquads
driving the 5-band ``Equaliser``, reference ``common_audioeffects.py:370-525``,
and pyloudnorm's K-weighting pre-filters) for XLA:

- Coefficients (low/high shelf, peaking, low/high pass) are computed in jnp
  so they can be traced/vmapped over random EQ parameters.
- The order-2 recurrence is evaluated either as a sequential ``lax.scan``
  (``biquad_apply_scan``) or as a parallel ``associative_scan`` over 2x2
  companion matrices (``biquad_apply``) — O(T log T) work but O(log T) depth,
  the right trade for TPU.

All filters follow scipy ``lfilter`` zero initial-state semantics.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# coefficient design (RBJ Audio EQ Cookbook)
# --------------------------------------------------------------------------
def rbj_coeffs(filter_type: str, G_db, Q, fc, rate) -> jnp.ndarray:
    """Return normalized ``[b0, b1, b2, a1, a2]`` (a0 == 1) coefficients.

    ``filter_type`` in {'low_shelf','high_shelf','peaking','low_pass','high_pass'}.
    Matches the pymixconsole/pyloudnorm RBJ implementations used by the
    reference Equaliser (``common_audioeffects.py:438-462``).
    """
    G_db = jnp.asarray(G_db, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    A = 10.0 ** (G_db / 40.0)
    w0 = 2.0 * jnp.pi * (fc / rate)
    cosw, sinw = jnp.cos(w0), jnp.sin(w0)
    alpha = sinw / (2.0 * Q)
    sqA = jnp.sqrt(A)

    if filter_type == "low_shelf":
        b0 = A * ((A + 1) - (A - 1) * cosw + 2 * sqA * alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cosw)
        b2 = A * ((A + 1) - (A - 1) * cosw - 2 * sqA * alpha)
        a0 = (A + 1) + (A - 1) * cosw + 2 * sqA * alpha
        a1 = -2 * ((A - 1) + (A + 1) * cosw)
        a2 = (A + 1) + (A - 1) * cosw - 2 * sqA * alpha
    elif filter_type == "high_shelf":
        b0 = A * ((A + 1) + (A - 1) * cosw + 2 * sqA * alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cosw)
        b2 = A * ((A + 1) + (A - 1) * cosw - 2 * sqA * alpha)
        a0 = (A + 1) - (A - 1) * cosw + 2 * sqA * alpha
        a1 = 2 * ((A - 1) - (A + 1) * cosw)
        a2 = (A + 1) - (A - 1) * cosw - 2 * sqA * alpha
    elif filter_type == "peaking":
        b0 = 1 + alpha * A
        b1 = -2 * cosw
        b2 = 1 - alpha * A
        a0 = 1 + alpha / A
        a1 = -2 * cosw
        a2 = 1 - alpha / A
    elif filter_type == "low_pass":
        b0 = (1 - cosw) / 2
        b1 = 1 - cosw
        b2 = (1 - cosw) / 2
        a0 = 1 + alpha
        a1 = -2 * cosw
        a2 = 1 - alpha
    elif filter_type == "high_pass":
        b0 = (1 + cosw) / 2
        b1 = -(1 + cosw)
        b2 = (1 + cosw) / 2
        a0 = 1 + alpha
        a1 = -2 * cosw
        a2 = 1 - alpha
    else:
        raise ValueError(f"unknown filter type: {filter_type}")

    return jnp.stack([b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0]).astype(jnp.float32)


def rbj_poles(filter_type: str, G_db, Q, fc, rate) -> jnp.ndarray:
    """Analytic pole pair of the RBJ designs — no discriminant cancellation.

    For all five types the normalized discriminant reduces to
    ``alpha'^2 - sin^2(w0)`` (with ``alpha' = alpha/A`` for peaking,
    ``alpha`` otherwise), which is numerically benign; float32 cannot compute
    it from ``a1^2 - 4 a2`` (total cancellation at critical damping, and
    XLA's simplifier defeats compensated-arithmetic tricks under jit).

    Returns complex64 ``[..., 2]``.
    """
    G_db = jnp.asarray(G_db, jnp.float32)
    A = 10.0 ** (G_db / 40.0)
    w0 = 2.0 * jnp.pi * (fc / rate)
    cosw, sinw = jnp.cos(w0), jnp.sin(w0)
    alpha = sinw / (2.0 * Q)

    if filter_type in ("peaking",):
        ap = alpha / A
        s = jnp.sqrt((ap * ap - sinw * sinw).astype(jnp.complex64))
        denom = (1.0 + ap).astype(jnp.complex64)
        p1 = (cosw + s) / denom
        p2 = (cosw - s) / denom
    elif filter_type in ("low_pass", "high_pass"):
        s = jnp.sqrt((alpha * alpha - sinw * sinw).astype(jnp.complex64))
        denom = (1.0 + alpha).astype(jnp.complex64)
        p1 = (cosw + s) / denom
        p2 = (cosw - s) / denom
    elif filter_type in ("low_shelf", "high_shelf"):
        sqA = jnp.sqrt(A)
        s = jnp.sqrt((alpha * alpha - sinw * sinw).astype(jnp.complex64))
        # low_shelf:  u = (A-1) + (A+1) cosw,  a0 = (A+1) + (A-1) cosw + 2 sqA alpha
        # high_shelf: u = (A+1) cosw - (A-1),  a0 = (A+1) - (A-1) cosw + 2 sqA alpha
        if filter_type == "low_shelf":
            u = (A - 1) + (A + 1) * cosw
            a0 = (A + 1) + (A - 1) * cosw + 2 * sqA * alpha
        else:
            u = (A + 1) * cosw - (A - 1)
            a0 = (A + 1) - (A - 1) * cosw + 2 * sqA * alpha
        u = u.astype(jnp.complex64)
        a0 = a0.astype(jnp.complex64)
        p1 = (u + 2.0 * sqA * s) / a0
        p2 = (u - 2.0 * sqA * s) / a0
    else:
        raise ValueError(f"unknown filter type: {filter_type}")

    return jnp.stack([p1, p2], axis=-1).astype(jnp.complex64)


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------
def biquad_apply_scan(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Sequential direct-form-II-transposed biquad over the last axis.

    ``x``: ``[..., T]``; ``coeffs``: ``[5]`` or ``[..., 5]`` broadcastable to
    the batch shape. Bit-matches scipy ``lfilter`` ordering of operations.
    """
    b0, b1, b2, a1, a2 = [coeffs[..., i] for i in range(5)]
    batch_shape = x.shape[:-1]
    z1 = jnp.zeros(batch_shape, x.dtype)
    z2 = jnp.zeros(batch_shape, x.dtype)

    def step(carry, xn):
        z1, z2 = carry
        yn = b0 * xn + z1
        z1n = b1 * xn + z2 - a1 * yn
        z2n = b2 * xn - a2 * yn
        return (z1n, z2n), yn

    _, y = jax.lax.scan(step, (z1, z2), jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def _compensated_disc(a1: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    """``a1*a1 - 4*a2`` with Dekker two-product compensation.

    For critically-damped filters (e.g. RBJ Q=0.5) the discriminant suffers
    total cancellation in float32; the Veltkamp split recovers the low-order
    bits of ``a1*a1`` so pole locations stay accurate.
    """
    split = jnp.asarray(4097.0, a1.dtype)  # 2^12 + 1 for float32
    c = a1 * split
    hi = c - (c - a1)
    lo = a1 - hi
    p = a1 * a1
    err = ((hi * hi - p) + 2.0 * hi * lo) + lo * lo
    return (p - 4.0 * a2) + err


def biquad_apply(
    x: jnp.ndarray, coeffs: jnp.ndarray, poles: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Parallel biquad as a cascade of two first-order associative scans.

    The AR recurrence ``y[n] = f[n] - a1 y[n-1] - a2 y[n-2]`` (with FIR part
    ``f = b0 x + b1 x[-1] + b2 x[-2]``) factors over the poles:
    ``1/D(z) = 1/((1 - p1 z^-1)(1 - p2 z^-1))``, i.e. two first-order
    recurrences applied in series:

        t[n] = p1 t[n-1] + f[n];   y[n] = p2 y[n-1] + t[n]

    each solved in O(log T) depth with ``associative_scan`` on complex64.
    This form needs no partial-fraction ``1/(p1-p2)`` (robust at repeated
    poles) and is far better conditioned in float32 than composing 2x2
    companion matrices. NRMSE vs float64 scipy ``lfilter`` is ~1e-5 even for
    an 80 Hz shelf or a critically-damped 38 Hz high-pass.

    Args:
        poles: optional analytic pole pair ``[..., 2]`` complex (e.g. from
            :func:`rbj_poles`, or host-side ``np.roots`` for scipy designs).
            When absent, poles are recovered from ``a1, a2`` — accurate except
            near critical damping (float32 discriminant cancellation), so
            prefer passing them for traced/random filter parameters.
    """
    b = coeffs[..., :3]
    a1 = coeffs[..., 3]
    a2 = coeffs[..., 4]

    # FIR part (parallel): f[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]
    x1 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    x2 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(2, 0)])[..., :-2]
    f = b[..., 0:1] * x + b[..., 1:2] * x1 + b[..., 2:3] * x2

    if poles is not None:
        p1 = poles[..., 0]
        p2 = poles[..., 1]
    else:
        disc = jnp.sqrt(_compensated_disc(a1, a2).astype(jnp.complex64))
        p1 = (-a1.astype(jnp.complex64) + disc) / 2.0
        p2 = (-a1.astype(jnp.complex64) - disc) / 2.0
    # stability guard: designed filters are stable; any |p|>1 is numerical
    # error and would overflow the scan — clamp the radius
    def _clamp(p):
        r = jnp.abs(p)
        return jnp.where(r > 0.999999, p * (0.999999 / r), p)

    p1, p2 = _clamp(p1), _clamp(p2)

    def bcast(p):
        return jnp.broadcast_to(
            jnp.reshape(p, p.shape + (1,) * (f.ndim - p.ndim)), f.shape
        ).astype(jnp.complex64)

    def combine(l, r):
        la, lb = l
        ra, rb = r
        return ra * la, ra * lb + rb

    _, t = jax.lax.associative_scan(combine, (bcast(p1), f.astype(jnp.complex64)), axis=-1)
    _, y = jax.lax.associative_scan(combine, (bcast(p2), t), axis=-1)
    return jnp.real(y).astype(x.dtype)


def biquad_impulse_response(
    coeffs: jnp.ndarray, poles: Optional[jnp.ndarray] = None, ir_len: int = 16384
) -> jnp.ndarray:
    """Impulse response ``[..., ir_len]`` of the biquad (associative scan over
    a short axis — cheap)."""
    batch = coeffs.shape[:-1]
    delta = jnp.zeros(batch + (ir_len,), jnp.float32).at[..., 0].set(1.0)
    return biquad_apply(delta, coeffs, poles=poles)


def biquad_apply_fft(
    x: jnp.ndarray,
    coeffs: jnp.ndarray,
    poles: Optional[jnp.ndarray] = None,
    ir_len: int = 16384,
) -> jnp.ndarray:
    """Causal biquad filtering via truncated-IR FFT convolution.

    For long signals this is the TPU-right evaluation: the recurrence runs
    only over ``ir_len`` samples (to realize the impulse response), then one
    FFT convolution applies it. Stable audio biquads decay far below 1e-6
    within 16k samples, so this matches ``lfilter`` to float32 noise; prefer
    :func:`biquad_apply` for short signals or pathologically-resonant filters.
    """
    from .fftconv import fft_convolve_full

    ir = biquad_impulse_response(coeffs, poles=poles, ir_len=ir_len)
    y = fft_convolve_full(x, ir.astype(x.dtype))
    return y[..., : x.shape[-1]]


def biquad_freq_response(coeffs: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """Exact transfer function H(e^{j w}) of the biquad at the given
    normalized frequencies. ``coeffs [..., 5]``, ``omega [M]`` ->
    ``[..., M]`` complex64."""
    z1 = jnp.exp(-1j * omega).astype(jnp.complex64)
    z2 = z1 * z1
    b0 = coeffs[..., 0:1].astype(jnp.complex64)
    b1 = coeffs[..., 1:2].astype(jnp.complex64)
    b2 = coeffs[..., 2:3].astype(jnp.complex64)
    a1 = coeffs[..., 3:4].astype(jnp.complex64)
    a2 = coeffs[..., 4:5].astype(jnp.complex64)
    return (b0 + b1 * z1 + b2 * z2) / (1.0 + a1 * z1 + a2 * z2)


def biquad_cascade_fft(
    x: jnp.ndarray, coeffs_list: jnp.ndarray, tail: int = 16384
) -> jnp.ndarray:
    """Apply a cascade of biquads to long audio as ONE spectral multiply.

    The combined response ``prod_i H_i`` is evaluated analytically at rfft
    bins of the zero-padded signal (pad >= IR decay length so the circular
    tail is negligible) — no recurrence anywhere, exactly the Freeverb
    evaluation strategy. ``coeffs_list [n_filters, ..., 5]`` broadcastable
    against ``x [..., T]`` batch dims.
    """
    T = x.shape[-1]
    n = 1 << int(np.ceil(np.log2(T + tail)))
    omega = 2.0 * jnp.pi * jnp.arange(n // 2 + 1, dtype=jnp.float32) / n
    H = None
    for i in range(coeffs_list.shape[0]):
        Hi = biquad_freq_response(coeffs_list[i], omega)
        H = Hi if H is None else H * Hi
    X = jnp.fft.rfft(x, n=n, axis=-1)
    y = jnp.fft.irfft(X * H, n=n, axis=-1)
    return y[..., :T].astype(x.dtype)


def biquad_cascade(x: jnp.ndarray, coeffs_list: jnp.ndarray, parallel: bool = True) -> jnp.ndarray:
    """Apply ``coeffs_list [n_filters, ..., 5]`` biquads in series."""
    apply_fn = biquad_apply if parallel else biquad_apply_scan
    # filter count is static and small (<=5): unrolled loop keeps XLA fusion
    for i in range(coeffs_list.shape[0]):
        x = apply_fn(x, coeffs_list[i])
    return x


# --------------------------------------------------------------------------
# zero-phase filtering (scipy.filtfilt parity)
# --------------------------------------------------------------------------
def _odd_ext(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Odd extension on both ends of the last axis (scipy padtype='odd')."""
    left = 2 * x[..., :1] - x[..., n:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -n - 2 : -1]
    return jnp.concatenate([left, x, right], axis=-1)


def fir_filter(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR (lfilter(b, 1, x)): y[n] = sum_k b[k] x[n-k], via conv."""
    ntaps = taps.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(ntaps - 1, 0)])
    # correlate with reversed taps == convolution
    batch = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    xr = xp.reshape(batch, 1, -1)
    k = taps[::-1].reshape(1, 1, -1).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(xr.shape, k.shape, ("NCH", "OIH", "NCH"))
    y = jax.lax.conv_general_dilated(
        xr, k, (1,), "VALID", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(x.shape)


def filtfilt_fir(x: jnp.ndarray, taps: jnp.ndarray, padlen: int | None = None) -> jnp.ndarray:
    """Zero-phase FIR filtering, scipy ``filtfilt(b, 1, x, padtype='odd')``.

    Used for the EQ-matching FIR (reference
    ``utils_data_normalization.py:100-102``).
    """
    ntaps = int(taps.shape[-1])
    if padlen is None:
        padlen = 3 * ntaps
    ext = _odd_ext(x, padlen)
    y = fir_filter(ext, taps)
    y = y[..., ::-1]
    y = fir_filter(y, taps)
    y = y[..., ::-1]
    return y[..., padlen : ext.shape[-1] - padlen]


def filtfilt_biquad(x: jnp.ndarray, coeffs: jnp.ndarray, padlen: int = 9) -> jnp.ndarray:
    """Zero-phase biquad filtering (scipy filtfilt with odd padding, zero ic).

    Note: scipy uses ``lfilter_zi``-based initial conditions; with the odd
    extension the end effects differ only at the boundaries and decay with the
    filter's impulse response — adequate for the butterworth band-splits used
    in panning features (reference ``fx_utils.py:206-213``).
    """
    ext = _odd_ext(x, padlen)
    y = biquad_apply(ext, coeffs)
    y = biquad_apply(y[..., ::-1], coeffs)[..., ::-1]
    return y[..., padlen : ext.shape[-1] - padlen]

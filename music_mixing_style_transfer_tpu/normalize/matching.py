"""EQ / compression matching DSP for audio-effects normalization.

TPU re-design of the matching core
(``mixing_manipulator/utils_data_normalization.py:65-429``):

- ``get_eq_matching``: average-magnitude-spectrum match via a zero-phase FIR.
  The average spectrum is computed on device (STFT 65536 / hop 16384,
  sqrt-hann); the 1001-tap FIR design (scipy ``firwin2``) runs on host
  (parameter-sized, once per song); the ``filtfilt`` applies on device.
- ``hfc_onsets``: high-frequency-content onset detector replacing the aubio
  C library (``utils_data_normalization.py:304-314``): HFC(n) = sum_k k*|X_n[k]|
  over 1024-sample non-overlapped frames, peak-picked against an adaptive
  median threshold.
- ``mean_peak_db``: mean/std of onset-aligned peak levels above a percentile.
- ``comp_match_grid``: the reference's sequential (ratio, threshold) search
  becomes ONE batched compressor sweep over the whole grid (grid as the
  batch/lane axis — this is where the TPU envelope scan gets its
  parallelism), followed by an ordered first-satisfying select.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops.biquad import filtfilt_fir
from ..ops.compressor import compressor_process
from ..ops.loudness import lufs_normalize, peak_normalize
from ..ops.stft import frame, istft, sqrt_hann_window, stft


def amp_to_db(x):
    return 20.0 * np.log10(x + 1e-30)


def db_to_amp(x):
    return 10.0 ** (x / 20.0)


# ===========================================================================
# EQ matching
# ===========================================================================
@partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def average_magnitude_spectrum(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Mean |STFT| over frames of mono ``[T]`` (sqrt-hann, center=False)."""
    win = sqrt_hann_window(n_fft)
    spec = stft(x, n_fft, hop_length, win, center=False)
    return jnp.mean(jnp.abs(spec), axis=-2)


def design_eq_fir(
    audio_spec: np.ndarray, ref_spec: np.ndarray, ntaps: int = 1001
) -> np.ndarray:
    """Host-side FIR design for the sqrt amplitude-ratio curve
    (reference ``utils_data_normalization.py:82-98``; the forward+backward
    filtfilt application squares the response back to the full ratio)."""
    m = ref_spec.shape[0]
    frq = np.arange(m) / (m / 1.0)  # relative bin positions
    frq = frq / np.max(frq)
    diff_db = amp_to_db(ref_spec) - amp_to_db(audio_spec)
    diff = np.sqrt(db_to_amp(diff_db))
    return scipy.signal.firwin2(ntaps, frq, diff, window="hamming").astype(np.float32)


@partial(jax.jit, static_argnames=("ntaps",))
def design_eq_fir_batch(
    audio_specs: jnp.ndarray, ref_specs: jnp.ndarray, ntaps: int = 1001
) -> jnp.ndarray:
    """Device-resident batched FIR design: ``[N, m] x [N, m] -> [N, ntaps]``.

    Same construction as :func:`design_eq_fir`'s ``scipy.signal.firwin2``
    (type-I linear phase: interpolate the desired response onto a uniform
    ``1 + 2**ceil(log2(ntaps))``-point grid, apply the linear-phase shift,
    irfft, symmetric hamming window) so the batched normalizer's EQ stage
    needs no spectra download / taps upload host round trip.
    """
    m = audio_specs.shape[-1]
    diff_db = 20.0 * (
        jnp.log10(ref_specs + 1e-30) - jnp.log10(audio_specs + 1e-30)
    )
    gain = jnp.sqrt(jnp.power(10.0, diff_db / 20.0))

    nfreqs = 1 + 2 ** int(np.ceil(np.log2(ntaps)))
    # source grid is uniform on [0, 1] with m points -> plain linear interp
    x = jnp.linspace(0.0, 1.0, nfreqs)
    src = jnp.arange(m, dtype=jnp.float32) / (m - 1)
    fx = jax.vmap(lambda g: jnp.interp(x, src, g))(gain)
    shift = jnp.exp(-(ntaps - 1) / 2.0 * 1j * jnp.pi * x)
    out_full = jnp.fft.irfft(fx * shift[None, :], n=2 * (nfreqs - 1), axis=-1)
    n = jnp.arange(ntaps)
    wind = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / (ntaps - 1))
    return (out_full[:, :ntaps] * wind[None, :]).astype(jnp.float32)


def eq_match(
    audio: jnp.ndarray,
    ref_spec: np.ndarray,
    sr: int = 44100,
    n_fft: int = 2**16,
    hop_length: int = 2**14,
    min_db: float = -50.0,
    ntaps: int = 1001,
    lufs: float = -30.0,
) -> jnp.ndarray:
    """Match a mono channel ``[T]`` to the target average spectrum.

    Device -> host -> device: avg spectrum on TPU, tiny FIR design on host,
    zero-phase filtering on TPU.
    """
    peak_db = amp_to_db(float(jnp.max(jnp.abs(audio))))
    if peak_db <= min_db:
        return audio
    audio = lufs_normalize(audio, sr, lufs)
    spec = np.asarray(average_magnitude_spectrum(audio, n_fft, hop_length))
    taps = design_eq_fir(spec, np.asarray(ref_spec), ntaps)
    return filtfilt_fir(audio, jnp.asarray(taps))


# ===========================================================================
# panning matching (dataset-prep normalization)
# ===========================================================================
def _sps(x: jnp.ndarray, n_fft: int, hop: int):
    """Stereo panning spectrum of ``[T, 2]`` audio (device version of
    reference ``get_SPS``, ``utils_data_normalization.py:109-139``).

    Returns (sps [F, bins], phi [F, bins])."""
    win = sqrt_hann_window(n_fft)
    spec = stft(x.T, n_fft, hop, win, center=False)  # [2, F, bins]
    # (reference uses eps=1e-20 in float64; in float32 its square underflows
    # to zero and NaNs the ratio — 1e-8 is still negligible vs audio bins)
    eps = 1e-8
    L = jnp.abs(spec[0]) + eps
    R = jnp.abs(spec[1]) + eps
    phi = 2 * (L * R) / (L**2 + R**2)
    delta_sign = jnp.sign((L * R) / L**2 - (R * L) / R**2)
    return (1 - phi) * delta_sign, phi


def _panning_gains(phi: jnp.ndarray, side) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin L/R gains from the similarity measure (reference
    ``get_panning_param_values`` :157-177)."""
    g = jnp.clip(phi + 1e-30, 0, 1) / 2
    p = jnp.where(side > 0, 1.0 - g, jnp.where(side < 0, g, 0.5))
    return 1.0 - p, p  # g_l, g_r


def panning_match(
    audio: jnp.ndarray,
    ref_phi: np.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop_length: int = 1024,
    min_db_f: float = -10.0,
    max_freq_pan: float = 16000.0,
) -> jnp.ndarray:
    """Match the stereo panning spectrum of ``[2, T]`` audio to a target
    (reference ``get_panning_matching``, ``utils_data_normalization.py:179-280``):
    pre-pan toward the dominant side, then scale L/R STFT magnitudes by the
    per-frame gain ratio toward the target panning, gated for quiet frames
    and frequencies above ``max_freq_pan``."""
    import scipy.signal as ss

    T = audio.shape[-1]
    x = jnp.pad(audio, ((0, 0), (n_fft, n_fft)))

    sps_mean, _ = _sps(np.asarray(x).T, n_fft, hop_length)
    sps_sm = ss.savgol_filter(np.asarray(jnp.mean(sps_mean, axis=0)), 501, 1, mode="mirror")
    f1 = int(np.floor(50 * n_fft / sr))
    f2 = int(np.floor(2500 * n_fft / sr))
    m = np.mean(np.sign(sps_sm[f1:f2] + 1e-10))
    side = m / abs(m) if m != 0 else 0.0

    alpha = 0.7 if side > 0 else 0.3
    gains = jnp.asarray([1.0 - alpha, alpha], jnp.float32)  # linear pan law
    x = x * gains[:, None]

    _, phi_frames = _sps(x.T, n_fft, hop_length)  # [F, bins]
    gl_i, gr_i = _panning_gains(phi_frames, side)
    gl_r, gr_r = _panning_gains(jnp.asarray(ref_phi)[None, :], side)
    eps = 1e-20
    g_l = gl_r / (gl_i + eps)
    g_r = gr_r / (gr_i + eps)

    win = sqrt_hann_window(n_fft)
    spec = stft(x, n_fft, hop_length, win, center=False)  # [2, F, bins]
    mono_mag = jnp.abs(spec[0] + spec[1])
    quiet = 20 * jnp.log10(jnp.max(mono_mag, axis=-1, keepdims=True) + 1e-30) < min_db_f
    g_l = jnp.where(quiet, 1.0, g_l)
    g_r = jnp.where(quiet, 1.0, g_r)
    fmax_bin = int(np.floor(max_freq_pan * n_fft / sr))
    band = (jnp.arange(g_l.shape[-1]) < fmax_bin)[None, :]
    g_l = jnp.where(band, g_l, 1.0)
    g_r = jnp.where(band, g_r, 1.0)

    new_spec = jnp.stack(
        [
            jnp.abs(spec[0]) * g_l * jnp.exp(1j * jnp.angle(spec[0])),
            jnp.abs(spec[1]) * g_r * jnp.exp(1j * jnp.angle(spec[1])),
        ]
    )
    y = istft(new_spec, hop_length, win, center=False)
    return y[:, n_fft : n_fft + T]


# ===========================================================================
# HFC onsets + mean peak
# ===========================================================================
@partial(jax.jit, static_argnames=("window_size", "hop_size"))
def hfc_onset_mask(
    x: jnp.ndarray,
    window_size: int = 1024,
    hop_size: int = 1024,
    threshold: float = 0.3,
    silence_db: float = -70.0,
    median_span: int = 5,
) -> jnp.ndarray:
    """Boolean onset mask per frame for ``x [..., T]``.

    HFC onset function with aubio-style adaptive peak-picking: a frame is an
    onset when its (normalized) HFC exceeds the local median by ``threshold``
    and is a local maximum, and the frame is not silent.
    """
    T = x.shape[-1]
    if T < window_size or T // hop_size == 0:
        return jnp.zeros(x.shape[:-1] + (0,), bool)
    hfc_raw, _, frame_db = frame_peak_features(x, window_size, hop_size)
    return onset_mask_from_features(
        hfc_raw, frame_db, threshold, silence_db, median_span
    )


@partial(jax.jit, static_argnames=("window_size", "hop_size"))
def frame_peak_features(
    x: jnp.ndarray, window_size: int = 1024, hop_size: int = 1024
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-frame quantities of ``x [..., Ts]`` for onset/peak analysis:
    ``(hfc_raw, frame_max, frame_db)``, each ``[..., F]``.

    These are purely frame-local, so whole-song analyses can stream time
    slabs (``Ts`` a multiple of ``hop_size``) through this and concatenate —
    the frame arrays are ~3 orders of magnitude smaller than the audio.
    Requires ``window_size == hop_size`` (the non-overlapped framing the
    normalization matcher uses): the peak frames and STFT frames coincide.
    """
    assert window_size == hop_size, "streaming framing requires window == hop"
    n_frames = x.shape[-1] // hop_size
    frames = frame(x[..., : n_frames * hop_size], window_size, hop_size)
    win = jnp.asarray(np.hanning(window_size + 1)[:-1].astype(np.float32))
    mag = jnp.abs(jnp.fft.rfft(frames * win, axis=-1))  # [..., F, K]
    k = jnp.arange(mag.shape[-1], dtype=mag.dtype)
    hfc_raw = jnp.sum(mag * k, axis=-1)  # [..., F]
    frame_max = jnp.max(jnp.abs(frames), axis=-1)
    frame_db = 20.0 * jnp.log10(jnp.sqrt(jnp.mean(frames**2, axis=-1)) + 1e-12)
    return hfc_raw, frame_max, frame_db


@partial(jax.jit, static_argnames=("median_span",))
def onset_mask_from_features(
    hfc_raw: jnp.ndarray,
    frame_db: jnp.ndarray,
    threshold: float = 0.3,
    silence_db: float = -70.0,
    median_span: int = 5,
) -> jnp.ndarray:
    """Aubio-style adaptive peak-picking over per-frame HFC ``[..., F]``: a
    frame is an onset when its (globally normalized) HFC exceeds the local
    median by ``threshold`` and is a local maximum, and the frame is not
    silent."""
    hfc = hfc_raw / jnp.maximum(jnp.max(hfc_raw, axis=-1, keepdims=True), 1e-12)

    # local median threshold (centered window of 2*span+1)
    pad = median_span
    hfc_p = jnp.pad(hfc, [(0, 0)] * (hfc.ndim - 1) + [(pad, pad)], mode="edge")
    windows = frame(hfc_p, 2 * pad + 1, 1)  # [..., F, 2p+1]
    med = jnp.median(windows, axis=-1)

    prev = jnp.pad(hfc, [(0, 0)] * (hfc.ndim - 1) + [(1, 0)], mode="edge")[..., :-1]
    nxt = jnp.pad(hfc, [(0, 0)] * (hfc.ndim - 1) + [(0, 1)], mode="edge")[..., 1:]
    local_max = (hfc >= prev) & (hfc > nxt)

    loud = frame_db > silence_db
    return local_max & loud & (hfc > med + threshold * 0.1)


@partial(jax.jit, static_argnames=("hop_size", "percentile"))
def mean_peak_db(
    x: jnp.ndarray,
    onset_mask: jnp.ndarray,
    hop_size: int = 1024,
    percentile: float = 75.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, std) of dB peak levels in inter-onset intervals
    (reference ``get_mean_peak``, ``utils_data_normalization.py:284-338``).

    Batched over leading axes; intervals are realized as segment-max over a
    cumulative onset-count segmentation (static shapes, no host sync).
    """
    n_frames = onset_mask.shape[-1]
    T_used = n_frames * hop_size
    batch_shape = x.shape[:-1]
    xs = jnp.abs(x[..., :T_used]).reshape(batch_shape + (n_frames, hop_size))
    frame_max = jnp.max(xs, axis=-1)  # [..., F] (onsets are frame-aligned here,
    # a deviation from aubio's sample-accurate onset positions — the peak
    # statistic is unchanged up to frame quantization)
    return mean_peak_from_frames(frame_max, onset_mask, percentile=percentile)


@partial(jax.jit, static_argnames=("percentile",))
def mean_peak_from_frames(
    frame_max: jnp.ndarray,
    onset_mask: jnp.ndarray,
    percentile: float = 75.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-peak statistics from per-frame maxima ``[..., F]`` (the
    streaming-friendly core of :func:`mean_peak_db`)."""
    batch_shape = frame_max.shape[:-1]
    n_frames = frame_max.shape[-1]

    # segment id per frame: number of onsets at-or-before it (0 = pre-onset)
    seg_ids = jnp.cumsum(onset_mask.astype(jnp.int32), axis=-1)  # [..., F]
    n_segs = n_frames + 1

    flat_fm = frame_max.reshape(-1, n_frames)
    flat_ids = seg_ids.reshape(-1, n_frames)

    def seg_scatter(fm, ids):
        mx = jnp.zeros(n_segs, fm.dtype).at[ids].max(fm)
        cnt = jnp.zeros(n_segs, jnp.int32).at[ids].add(1)
        return mx, cnt

    seg_max, seg_cnt = jax.vmap(seg_scatter)(flat_fm, flat_ids)  # [B, S]
    seg_max = seg_max.reshape(batch_shape + (n_segs,))
    seg_cnt = seg_cnt.reshape(batch_shape + (n_segs,))
    valid = (seg_cnt > 0) & (jnp.arange(n_segs) > 0)  # drop pre-onset segment

    p_db = 20.0 * jnp.log10(seg_max + 1e-30)
    p_db = jnp.where(valid, p_db, jnp.nan)

    thr = jnp.nanpercentile(p_db, percentile, axis=-1, keepdims=True)
    above = p_db > thr
    n_above = jnp.sum(jnp.where(jnp.isnan(p_db), False, above), axis=-1)

    def masked_stats(mask):
        m = jnp.where(jnp.isnan(p_db), False, mask)
        n = jnp.maximum(jnp.sum(m, axis=-1), 1)
        mean = jnp.sum(jnp.where(m, p_db, 0.0), axis=-1) / n
        var = jnp.sum(jnp.where(m, (p_db - mean[..., None]) ** 2, 0.0), axis=-1) / n
        return mean, jnp.sqrt(var)

    mean_a, std_a = masked_stats(above)
    mean_all, std_all = masked_stats(jnp.ones_like(above, bool))
    use_above = n_above > 0
    return (
        jnp.where(use_above, mean_a, mean_all),
        jnp.where(use_above, std_a, std_all),
    )


def measure_mean_peak(x: jnp.ndarray, percentile: float = 75.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience: onsets + peak stats for ``x [..., T]``."""
    mask = hfc_onset_mask(x)
    return mean_peak_db(x, mask, percentile=percentile)


# ===========================================================================
# compression matching — parallel grid sweep
# ===========================================================================
def _comp_grid(ratio: float, min_th: float, max_ratio: float, expander: bool):
    """(ratio, threshold) candidate grid in the reference's search order
    (``utils_data_normalization.py:386-409``)."""
    ratios = np.linspace(ratio, max_ratio, int(max_ratio - ratio + 1))
    if expander:
        ths = np.linspace(-1, min_th, int(2 * abs(min_th) - 1))[::-1]
    else:
        ths = np.linspace(-1 - 9, min_th, int(2 * abs(min_th) - 1 - 18))
    R, T = np.meshgrid(ratios, ths, indexing="ij")  # row-major: ratio outer loop
    return R.reshape(-1).astype(np.float32), T.reshape(-1).astype(np.float32)


def _grid_compress(x, ratios, ths, attack, release, sample_rate, mode):
    """Compress x against a chunk of (ratio, threshold) candidates (the
    TPU-kernel-vs-scan dispatch lives in ops.compressor.compress_and_clip)."""
    from ..ops.compressor import compress_and_clip

    G = ratios.shape[0]
    xg = jnp.broadcast_to(x[None, :], (G, x.shape[-1]))
    rr = ratios if mode == "down" else 1.0 / ratios
    att = jnp.broadcast_to(jnp.asarray(attack, jnp.float32), (G,))
    rel = jnp.broadcast_to(jnp.asarray(release, jnp.float32), (G,))
    return compress_and_clip(xg, ths, att, rel, rr, sample_rate)


@partial(jax.jit, static_argnames=("sample_rate", "percentile", "mode"))
def _grid_peaks(x, ratios, ths, attack, release, sample_rate, percentile, mode):
    y = _grid_compress(x, ratios, ths, attack, release, sample_rate, mode)
    peaks, _ = measure_mean_peak(y, percentile=percentile)
    return peaks


@partial(jax.jit, static_argnames=("sample_rate", "mode"))
def _grid_one(x, ratio, th, attack, release, sample_rate, mode):
    return _grid_compress(
        x, jnp.reshape(ratio, (1,)), jnp.reshape(th, (1,)), attack, release,
        sample_rate, mode,
    )[0]


def _comp_match_select(
    x: jnp.ndarray,
    ratios: np.ndarray,
    ths: np.ndarray,
    attack: float,
    release: float,
    ref_peak: float,
    ref_std: float,
    sample_rate: int,
    percentile: float,
    mode: str,
    chunk: int = 96,
) -> jnp.ndarray:
    """Sweep the candidate grid in fixed-size chunks (bounded HBM: the full
    ~1000-candidate grid at song length would need several GB), early-exit at
    the first chunk containing a satisfying candidate (reference scan order,
    ``utils_data_normalization.py:386-424``), then recompute only the chosen
    candidate's output."""
    G = len(ratios)
    chosen = G - 1  # reference falls through to the last candidate
    for lo in range(0, G, chunk):
        r = np.full(chunk, ratios[-1], np.float32)
        t = np.full(chunk, ths[-1], np.float32)
        n = min(chunk, G - lo)
        r[:n] = ratios[lo : lo + n]
        t[:n] = ths[lo : lo + n]
        peaks = np.asarray(
            _grid_peaks(
                x, jnp.asarray(r), jnp.asarray(t), attack, release,
                sample_rate, percentile, mode,
            )
        )[:n]
        ok = peaks < (ref_peak + ref_std) if mode == "down" else peaks > (ref_peak - ref_std)
        if ok.any():
            chosen = lo + int(np.argmax(ok))
            break
    return _grid_one(
        x, jnp.asarray(ratios[chosen]), jnp.asarray(ths[chosen]),
        attack, release, sample_rate, mode,
    )


def comp_match(
    audio: jnp.ndarray,
    ref_peak: float,
    ref_std: float,
    ratio: float,
    attack_ms: float,
    release_ms: float,
    sr: int = 44100,
    min_db: float = -50.0,
    comp_peak_norm: float = -10.0,
    min_th: float = -40.0,
    max_ratio: float = 20.0,
    percentile: float = 75.0,
    expander: bool = True,
) -> jnp.ndarray:
    """Compression matching of a mono channel ``[T]``
    (reference ``get_comp_matching``, ``utils_data_normalization.py:357-429``).

    Downward-compress when the onset-peak feature is above the target band,
    upward-expand (optional) when below; the parameter search runs as one
    parallel sweep instead of nested host loops.
    """
    peak_db_in = amp_to_db(float(jnp.max(jnp.abs(audio))))
    if peak_db_in <= min_db:
        return audio

    x = peak_normalize(audio, comp_peak_norm)
    peak, _std = measure_mean_peak(x, percentile=percentile)
    peak = float(peak)

    if (ref_peak - ref_std) < peak < (ref_peak + ref_std):
        return x
    if peak > ref_peak - ref_std:  # too dynamic -> downward compression
        R, T = _comp_grid(ratio, min_th, max_ratio, expander=False)
        return _comp_match_select(
            x, R, T, attack_ms, release_ms,
            ref_peak, ref_std, sr, percentile, "down",
        )
    if expander:  # too flat -> upward expansion
        R, T = _comp_grid(ratio, min_th, max_ratio, expander=True)
        return _comp_match_select(
            x, R, T, attack_ms, release_ms,
            ref_peak, ref_std, sr, percentile, "up",
        )
    return x

"""Quantify the frame-aligned onset approximation.

The reference measures inter-onset peak statistics with aubio's
sample-accurate onset positions (``utils_data_normalization.py:284-338``);
this framework segments at non-overlapped 1024-sample frame boundaries
(``normalize/matching.py:mean_peak_db``), which quantizes each onset to its
frame start. These tests measure the effect of that quantization on the
quantity that actually drives compression matching — the percentile-mean
inter-onset peak level in dB — against a sample-accurate oracle that
replicates the reference's segmentation math exactly, on synthetic
percussive material with onsets at arbitrary (non-frame-aligned) sample
positions.

Measured bound (pinned in PARITY.md): the frame quantization moves the
peak statistic by well under the +-ref_std decision band the matcher uses
(``get_comp_matching`` at ``utils_data_normalization.py:379-381``), so the
compress / expand / in-band decision is unchanged.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from music_mixing_style_transfer_tpu.normalize.matching import (
    hfc_onset_mask,
    mean_peak_db,
)

SR = 44100
HOP = 1024


def _percussive(rng, n_hits=40, T=2**18, decay=0.004, min_gap=2048):
    """Decaying-noise bursts at random NON-frame-aligned sample positions."""
    x = np.zeros(T, np.float32)
    pos = np.sort(rng.choice(np.arange(HOP, T - 8 * HOP), n_hits, replace=False))
    pos = pos[np.concatenate([[True], np.diff(pos) > min_gap])]
    t = np.arange(4 * HOP)
    for p in pos:
        amp = float(rng.uniform(0.2, 0.9))
        burst = amp * np.exp(-decay * t) * rng.standard_normal(len(t))
        x[p : p + len(t)] += burst.astype(np.float32)
    peak = np.abs(x).max()
    return x / peak * 0.9, pos


def _oracle_mean_peak(x, onsets, percentile=75.0):
    """Reference ``get_mean_peak`` segmentation math with exact
    sample-accurate onset positions (``utils_data_normalization.py:316-336``)."""
    samples = []
    for i, p in enumerate(onsets[:-1]):
        samples.append(onsets[i] + np.argmax(np.abs(x[onsets[i] : onsets[i + 1]])))
    samples.append(onsets[-1] + np.argmax(np.abs(x[onsets[-1] :])))
    p_db = 20.0 * np.log10(np.abs(x[samples]) + 1e-30)
    above = p_db[p_db > np.percentile(p_db, percentile)]
    vals = above if len(above) else p_db
    return float(np.mean(vals)), float(np.std(vals))


def _frame_aligned_mean_peak(x, onsets, percentile=75.0):
    """Our segmentation with the SAME onsets, quantized to frame starts —
    isolates the frame-quantization error from detector differences."""
    n_frames = len(x) // HOP
    mask = np.zeros(n_frames, bool)
    mask[np.unique(onsets // HOP)] = True
    m, s = mean_peak_db(jnp.asarray(x), jnp.asarray(mask), hop_size=HOP,
                        percentile=percentile)
    return float(m), float(s)


def test_frame_quantization_error_is_small():
    """Same onset set, frame-quantized vs sample-accurate segmentation:
    the peak statistic moves by far less than any plausible ref_std band."""
    rng = np.random.default_rng(42)
    deltas = []
    for trial in range(6):
        x, pos = _percussive(rng)
        m_ref, s_ref = _oracle_mean_peak(x, pos)
        m_ours, _ = _frame_aligned_mean_peak(x, pos)
        deltas.append(abs(m_ours - m_ref))
    # measured: max ~0.1 dB on decaying-burst material; the comp matcher's
    # acceptance band is +-ref_std (typically several dB)
    assert max(deltas) < 0.75, f"frame quantization moved peak stat {deltas}"


def test_detector_end_to_end_statistic_close():
    """Full pipeline (our HFC detector + frame segmentation) vs the
    sample-accurate oracle fed the TRUE onset positions: the end-to-end
    statistic stays within a fraction of the decision band."""
    rng = np.random.default_rng(7)
    x, pos = _percussive(rng, n_hits=30)
    m_ref, s_ref = _oracle_mean_peak(x, pos)
    mask = hfc_onset_mask(jnp.asarray(x))
    m_ours, _ = mean_peak_db(jnp.asarray(x), mask, hop_size=HOP)
    assert abs(float(m_ours) - m_ref) < max(1.5, 0.5 * s_ref), (
        f"ours {float(m_ours):.2f} dB vs oracle {m_ref:.2f} dB (std {s_ref:.2f})"
    )


def test_comp_matching_decision_unchanged():
    """The compress/expand/in-band decision (reference
    ``get_comp_matching:379-381``) is identical under both statistics for a
    sweep of target bands around the measured values."""
    rng = np.random.default_rng(3)
    x, pos = _percussive(rng)
    m_ref, _ = _oracle_mean_peak(x, pos)
    m_ours, _ = _frame_aligned_mean_peak(x, pos)

    def decision(peak, ref_peak, ref_std):
        if (ref_peak - ref_std) < peak < (ref_peak + ref_std):
            return "in_band"
        return "compress" if peak > ref_peak - ref_std else "expand"

    ref_std = 2.0  # typical precomputed-feature std magnitude (dB)
    agree = disagree = 0
    for ref_peak in np.arange(m_ref - 8.0, m_ref + 8.0, 0.25):
        a = decision(m_ref, ref_peak, ref_std)
        b = decision(m_ours, ref_peak, ref_std)
        agree += a == b
        disagree += a != b
    # decisions may only differ for target bands whose edge falls inside the
    # (sub-dB) gap between the two statistics
    assert disagree <= np.ceil(abs(m_ref - m_ours) / 0.25) + 1, (
        f"decision flipped {disagree}/{agree + disagree} times; "
        f"stats {m_ref:.3f} vs {m_ours:.3f}"
    )

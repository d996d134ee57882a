"""Batched multi-stem FX normalization.

The reference normalizes stems one channel at a time on the host
(``data_normalization.py:87-155``); on TPU that leaves the chip idle between
dozens of small dispatches. This module runs ALL stems' channels through each
normalization stage together:

- loudness: vmapped BS.1770 + per-stem gains (one dispatch)
- EQ matching: batched average spectrum, per-channel FIR design, and
  zero-phase filtering all in one device dispatch chain (no host round trip)
- compression matching: one chunked (candidate x channel) grid sweep with
  per-channel modes (down/up/none) and early exit when every channel has
  found its first satisfying candidate
- imager: vmapped mid/side balancing per stem

Numerics are identical to the per-channel path (same stage math, same
skip rules); only the batching differs.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NormalizationConfig
from ..ops.biquad import _odd_ext
from ..ops.loudness import integrated_loudness
from .imager import normalize_imager
from ..ops.compressor import compress_and_clip
from ..ops.stft import sqrt_hann_window, stft
from .matching import (
    _comp_grid,
    amp_to_db,
    design_eq_fir_batch,
    measure_mean_peak,
)


# ---------------------------------------------------------------------------
# batched primitives
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("sample_rate",))
def _batched_loudness(stems_tc: jnp.ndarray, sample_rate: int = 44100) -> jnp.ndarray:
    """[S, T, 2] -> per-stem LUFS."""
    return jax.vmap(lambda x: integrated_loudness(x, sample_rate))(stems_tc)


@jax.jit
def _apply_gain_peak_protect(stems: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Reference lufs_normalize tail: gain then divide by max(1, peak+1e-6)."""
    y = stems * gains[:, None, None]
    maxabs = jnp.maximum(1.0, 1e-6 + jnp.max(jnp.abs(y), axis=(1, 2), keepdims=True))
    return y / maxabs


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def _batched_avg_spectrum(
    ch: jnp.ndarray, valid_frames: jnp.ndarray, n_fft: int, hop: int
) -> jnp.ndarray:
    """[N, T] -> [N, bins] mean |STFT| over each lane's first
    ``valid_frames[n]`` frames only — lanes are zero-padded to the longest
    stem, and including the padding frames would dilute the spectrum and
    turn into a spurious broadband EQ boost."""
    win = sqrt_hann_window(n_fft)
    spec = jnp.abs(stft(ch, n_fft, hop, win, center=False))  # [N, F, bins]
    F = spec.shape[-2]
    mask = (jnp.arange(F)[None, :] < valid_frames[:, None]).astype(spec.dtype)
    return jnp.sum(spec * mask[..., None], axis=-2) / jnp.maximum(
        valid_frames[:, None], 1
    )


@jax.jit
def _grouped_fir_filtfilt(ch: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase per-lane FIR: ``ch [N, T]`` with per-lane ``taps [N, K]``.

    scipy ``filtfilt(b, 1, x, padtype='odd')`` semantics. filtfilt with an
    FIR is conv with the taps' autocorrelation, i.e. a zero-phase spectral
    multiply by |B(w)|^2 — evaluated at rfft bins of the odd-extended signal
    (time-domain grouped convs at 1001 taps x song length compile for
    minutes on TPU; this compiles instantly and runs in one FFT round trip).
    """
    N, T = ch.shape
    K = taps.shape[-1]
    padlen = 3 * K
    ext = _odd_ext(ch, padlen)  # [N, L], L = T + 2*padlen
    L = ext.shape[-1]
    n = 1 << int(np.ceil(np.log2(L + 2 * K)))  # room for the filter tail
    H = jnp.fft.rfft(taps, n=n, axis=-1)
    H2 = (H * jnp.conj(H)).real.astype(jnp.complex64)  # |B|^2, zero phase
    X = jnp.fft.rfft(ext, n=n, axis=-1)
    y = jnp.fft.irfft(X * H2, n=n, axis=-1)
    # |B|^2 is zero-phase: same indices, negative lags wrap circularly into
    # the padding region (padlen > K-1 keeps the valid span clean)
    return y[:, padlen : padlen + T].astype(ch.dtype)


def _stream_peaks_batch(
    ch: jnp.ndarray,       # [N, T]
    ratios: np.ndarray,    # [N, Gc] effective ratios (already inverted for 'up')
    ths: np.ndarray,       # [N, Gc]
    attacks: np.ndarray,   # [N]
    releases: np.ndarray,  # [N]
    sample_rate: int,
    percentile: float = 75.0,
    slab_T: int = 1 << 18,
) -> jnp.ndarray:
    """Peaks feature for every (channel, candidate) pair: ``[N, Gc]``.

    The whole-song candidate sweep streams in time slabs: each slab is
    broadcast to the ``N*Gc`` lane grid, compressed with carried envelope
    state (:class:`CompressorStream` — bit-identical to a full-length pass),
    clipped, and reduced to per-frame features; only the tiny ``[N*Gc, F]``
    frame arrays persist. This bounds HBM at ``O(lanes * slab_T)`` instead of
    ``O(lanes * T)``, which is what lets a pass evaluate 128 candidates per
    channel at the envelope kernel's full 1024-lane width (the old
    full-length formulation OOMed past ~7 candidates on a 60 s song).

    The unconditional clip is exact: the per-lane rule "clip only when
    max|y| >= 1" (reference ``utils_data_normalization.py:352-355``) is
    pointwise-identical to ``clip(y)`` — the condition is precisely "clip is
    not a no-op".
    """
    from ..ops.compressor import CompressorStream
    from .matching import frame_peak_features, mean_peak_from_frames, onset_mask_from_features

    N, Gc = ratios.shape
    T_used = (int(ch.shape[-1]) // 1024) * 1024
    stream = CompressorStream(
        jnp.asarray(ths.reshape(-1)),
        jnp.asarray(np.repeat(attacks, Gc)),
        jnp.asarray(np.repeat(releases, Gc)),
        jnp.asarray(ratios.reshape(-1)),
        sample_rate,
    )
    hfcs, fmaxs, fdbs = [], [], []
    for s0 in range(0, T_used, slab_T):
        xs = ch[:, s0 : min(s0 + slab_T, T_used)]
        Ts = xs.shape[-1]
        xg = jnp.broadcast_to(xs[:, None, :], (N, Gc, Ts)).reshape(N * Gc, Ts)
        y = jnp.clip(stream.process(xg), -1.0, 1.0)
        h, fm, fd = frame_peak_features(y)
        hfcs.append(h)
        fmaxs.append(fm)
        fdbs.append(fd)

    cat = partial(jnp.concatenate, axis=-1)
    mask = onset_mask_from_features(cat(hfcs), cat(fdbs))
    peaks, _ = mean_peak_from_frames(cat(fmaxs), mask, percentile=percentile)
    return peaks.reshape(N, Gc)


@partial(jax.jit, static_argnames=("sample_rate",))
def _compress_chosen(
    ch: jnp.ndarray, ratios: jnp.ndarray, ths: jnp.ndarray,
    attacks: jnp.ndarray, releases: jnp.ndarray, sample_rate: int,
) -> jnp.ndarray:
    """One compressor pass with per-lane chosen parameters: [N, T]."""
    return compress_and_clip(ch, ths, attacks, releases, ratios, sample_rate)


# ---------------------------------------------------------------------------
# batched normalizer
# ---------------------------------------------------------------------------
class BatchedAudioEffectsNormalizer:
    """Multi-stem batched version of :class:`.normalizer.AudioEffectsNormalizer`.

    ``normalize_stems({'drums': [2,T], ...}) -> same structure`` with every
    stage executed once for all stems.
    """

    def __init__(self, features: Dict[str, Dict[str, np.ndarray]], config: Optional[NormalizationConfig] = None):
        self.cfg = config or NormalizationConfig()
        self.features = features

    # -- stages -------------------------------------------------------
    def _stage_loudness(self, stems: jnp.ndarray, insts: Sequence[str]) -> jnp.ndarray:
        targets = jnp.asarray(
            [float(np.ravel(self.features["loudness"][i])[0]) for i in insts]
        )
        loud = _batched_loudness(
            jnp.swapaxes(stems, 1, 2) + 1e-10, self.cfg.sample_rate
        )
        # fully-gated stems measure -inf LUFS -> inf gain; skip them
        gains = jnp.where(
            jnp.isfinite(loud), jnp.power(10.0, (targets - loud) / 20.0), 1.0
        )
        return _apply_gain_peak_protect(stems, gains)

    def _stage_eq(
        self, stems: jnp.ndarray, insts: Sequence[str], lengths: Sequence[int]
    ) -> jnp.ndarray:
        cfg = self.cfg
        S = stems.shape[0]
        ch = stems.reshape(S * 2, -1)  # [N, T]
        # silent channels skip the stage entirely (per-stem path's min_db
        # rule, matching.eq_match) — a -inf LUFS channel would otherwise
        # produce inf gains and NaN taps. The mask only selects outputs, so
        # it stays on device (no host round trip).
        silent = (
            20.0 * jnp.log10(jnp.max(jnp.abs(ch), axis=-1) + 1e-30) <= cfg.min_db
        )
        # per-channel LUFS normalization (channel treated as mono signal)
        loud = jax.vmap(
            lambda x: integrated_loudness(x[:, None] + 1e-10, cfg.sample_rate)
        )(ch)
        gains = jnp.where(
            jnp.isfinite(loud), jnp.power(10.0, (cfg.lufs - loud) / 20.0), 1.0
        )
        y = ch * gains[:, None]
        maxabs = jnp.maximum(1.0, 1e-6 + jnp.max(jnp.abs(y), axis=-1, keepdims=True))
        y = y / maxabs
        # frames within each stem's own (padded) span; zero-pad to the
        # longest stem must not dilute the average spectrum
        spans = np.asarray([2 * cfg.fft_size + lengths[n // 2] for n in range(S * 2)])
        valid = np.maximum(1 + (spans - cfg.fft_size) // cfg.hop_length, 1)
        specs = _batched_avg_spectrum(
            y, jnp.asarray(valid, jnp.int32), cfg.fft_size, cfg.hop_length
        )
        # FIR design on device (matches scipy firwin2 to f32 precision):
        # the whole EQ stage is one dispatch chain, no host round trip
        refs = jnp.asarray(
            np.stack([self.features["eq"][insts[n // 2]] for n in range(S * 2)])
        )
        taps = design_eq_fir_batch(specs, refs, cfg.ntaps)
        out = _grouped_fir_filtfilt(y, taps)
        out = jnp.where(silent[:, None], ch, out)
        return out.reshape(S, 2, -1)

    def _comp_static(self, insts: Sequence[str]):
        """Config-only per-channel compression constants + BOTH mode grids
        (edge-padded to a common width). Everything here is data-independent,
        so the data-dependent mode choice can happen on device."""
        cfg = self.cfg
        N = len(insts) * 2
        ref_peak = np.asarray(
            [float(self.features["compression"][insts[n // 2]][0]) for n in range(N)]
        )
        ref_std = np.asarray(
            [float(self.features["compression"][insts[n // 2]][1]) for n in range(N)]
        )
        attacks = np.asarray([cfg.comp_settings[insts[n // 2]][0] for n in range(N)], np.float32)
        releases = np.asarray([cfg.comp_settings[insts[n // 2]][1] for n in range(N)], np.float32)

        grids = {}  # mode -> (grid_r [N, Gm], grid_t [N, Gm])
        per_mode = []
        for n in range(N):
            base = float(cfg.comp_settings[insts[n // 2]][2])
            Rd, Td = _comp_grid(base, cfg.comp_min_th, cfg.comp_max_ratio, expander=False)
            Ru, Tu = _comp_grid(base, cfg.comp_min_th, cfg.comp_max_ratio, expander=True)
            per_mode.append(((Rd, Td), (1.0 / Ru, Tu)))
        Gm = max(1, max(max(len(g[0][0]), len(g[1][0])) for g in per_mode))
        for mi, mode in enumerate(("down", "up")):
            gr = np.ones((N, Gm), np.float32)
            gt = np.zeros((N, Gm), np.float32)
            for n in range(N):
                R, T = per_mode[n][mi]
                g = len(R)
                if g == 0:
                    # empty grid (possible under narrow comp configs):
                    # identity candidates only — the channel falls through
                    # uncompressed like the reference's empty sweep loop
                    continue
                gr[n, :g], gt[n, :g] = R, T
                gr[n, g:], gt[n, g:] = R[-1], T[-1]
            grids[mode] = (gr, gt)
        return ref_peak, ref_std, attacks, releases, grids, Gm

    def _stage_compression(self, stems: jnp.ndarray, insts: Sequence[str]) -> jnp.ndarray:
        """Compression matching, device-resident in the common case.

        The mode decision (down / up / in-band), the first candidate block's
        sweep, the first-satisfying selection, AND the final compression all
        run on device — the only host round trip is one boolean ("did every
        active channel find a candidate in the first block?"), and it is read
        back AFTER the final compression is already dispatched, so its
        latency hides behind device work. Channels that need candidates
        beyond the first block (rare: chosen indices cluster in the first few
        dozen grid entries) fall back to the host-stepped sweep."""
        cfg = self.cfg
        S = stems.shape[0]
        N = S * 2
        ch = stems.reshape(N, -1)

        # per-channel peak-normalize to -10 dB (reference pyln.normalize.peak)
        peaks = jnp.max(jnp.abs(ch), axis=-1, keepdims=True)
        x = ch * (10 ** (cfg.comp_peak_norm / 20.0) / jnp.maximum(peaks, 1e-30))

        featd, _ = measure_mean_peak(x, percentile=float(cfg.comp_percentile))

        ref_peak, ref_std, attacks, releases, grids, Gm = self._comp_static(insts)
        lo_d = jnp.asarray(ref_peak - ref_std)
        hi_d = jnp.asarray(ref_peak + ref_std)

        in_band = (featd > lo_d) & (featd < hi_d)
        down_d = (~in_band) & (featd > lo_d)
        up_d = (~in_band) & ~down_d & bool(cfg.comp_use_expander)
        active_d = (down_d | up_d) & jnp.isfinite(featd)

        grid_r = jnp.where(
            down_d[:, None], jnp.asarray(grids["down"][0]), jnp.asarray(grids["up"][0])
        )
        grid_t = jnp.where(
            down_d[:, None], jnp.asarray(grids["down"][1]), jnp.asarray(grids["up"][1])
        )

        # first candidate block fills the envelope kernel's 1024-lane width
        from ..ops.pallas.envelope import BLOCK_LANES

        Gc = int(min(Gm, max(1, BLOCK_LANES // max(N, 1))))
        pk = _stream_peaks_batch(
            x, grid_r[:, :Gc], grid_t[:, :Gc], attacks, releases,
            cfg.sample_rate, float(cfg.comp_percentile),
        )  # [N, Gc] on device
        ok = jnp.where(down_d[:, None], pk < hi_d[:, None], pk > lo_d[:, None])
        any0 = jnp.any(ok, axis=1)
        # first satisfying candidate; reference falls through to the LAST
        # candidate when none satisfies (edge padding makes Gm-1 per-channel)
        idx = jnp.where(any0, jnp.argmax(ok, axis=1), Gm - 1)
        sel_r = jnp.take_along_axis(grid_r, idx[:, None], axis=1)[:, 0]
        sel_t = jnp.take_along_axis(grid_t, idx[:, None], axis=1)[:, 0]
        sel_r = jnp.where(active_d, sel_r, 1.0)
        sel_t = jnp.where(active_d, sel_t, 0.0)
        y = _compress_chosen(
            x, sel_r, sel_t, jnp.asarray(attacks), jnp.asarray(releases),
            cfg.sample_rate,
        )
        # inactive (in-band) channels keep the peak-normalized x (reference :379-381)
        y = jnp.where(active_d[:, None], y, x)

        # the ONE host round trip — overlaps the final compression above
        if Gc < Gm and bool(np.asarray(jnp.any(active_d & ~any0))):
            y = self._comp_host_sweep(
                x, np.asarray(featd), np.asarray(down_d), np.asarray(up_d),
                np.asarray(active_d), np.asarray(grid_r), np.asarray(grid_t),
                ref_peak, ref_std, attacks, releases, Gc, Gm,
            )
        return y.reshape(S, 2, -1)

    def _comp_host_sweep(
        self, x, feat, down, up, active, grid_r, grid_t,
        ref_peak, ref_std, attacks, releases, Gc, Gm,
    ) -> jnp.ndarray:
        """Host-stepped early-exit sweep over the full grid (the rare path:
        some channel's first satisfying candidate lies beyond block 0)."""
        cfg = self.cfg
        N = x.shape[0]
        chosen = np.full(N, Gm - 1, np.int64)
        found = ~active
        for lo in range(0, Gm, Gc):
            if found.all():
                break
            r = grid_r[:, lo : lo + Gc]
            t = grid_t[:, lo : lo + Gc]
            if r.shape[1] < Gc:
                r = np.pad(r, ((0, 0), (0, Gc - r.shape[1])), mode="edge")
                t = np.pad(t, ((0, 0), (0, Gc - t.shape[1])), mode="edge")
            pk = np.asarray(
                _stream_peaks_batch(
                    x, r, t, attacks, releases, cfg.sample_rate,
                    float(cfg.comp_percentile),
                )
            )
            n_valid = min(Gc, Gm - lo)
            ok = np.where(
                down[:, None], pk < (ref_peak + ref_std)[:, None],
                pk > (ref_peak - ref_std)[:, None],
            )[:, :n_valid]
            for n in range(N):
                if not found[n] and ok[n].any():
                    chosen[n] = lo + int(np.argmax(ok[n]))
                    found[n] = True

        sel_r = np.where(active, grid_r[np.arange(N), chosen], 1.0).astype(np.float32)
        sel_t = np.where(active, grid_t[np.arange(N), chosen], 0.0).astype(np.float32)
        y = _compress_chosen(
            x, jnp.asarray(sel_r), jnp.asarray(sel_t),
            jnp.asarray(attacks), jnp.asarray(releases), cfg.sample_rate,
        )
        return jnp.where(jnp.asarray(active)[:, None], y, x)

    def _stage_imager(self, stems: jnp.ndarray, insts: Sequence[str]) -> jnp.ndarray:
        targets = jnp.asarray([float(self.features["imager"][i]) for i in insts])
        thresholds = jnp.asarray([0.99 if i == "bass" else 0.975 for i in insts])
        return jax.vmap(
            lambda a, t, m: normalize_imager(
                a, target_side_mid_bal=t, mono_threshold=m, sr=self.cfg.sample_rate
            )
        )(stems, targets, thresholds)

    # -- orchestration --------------------------------------------------
    def normalize_device(
        self, x: jnp.ndarray, insts: Sequence[str], length_list: Sequence[int]
    ) -> jnp.ndarray:
        """Device-resident core: ``x [S, 2, fft + T + fft]`` (already
        margin-padded, float32, ON DEVICE) -> same shape on device. The only
        host round trips are the tiny per-stage decision scalars (skip
        flags, comp features) and the FIR tap design."""
        cfg = self.cfg
        # per-stem skip mask; selection-only, so it stays on device
        skip = (
            20.0 * jnp.log10(jnp.max(jnp.abs(x), axis=(1, 2)) + 1e-30) <= cfg.min_db
        )
        cur = x
        for effect in cfg.effects:
            if effect == "loudness":
                y = self._stage_loudness(cur, insts)
            elif effect == "eq":
                y = self._stage_eq(cur, insts, length_list)
            elif effect == "compression":
                y = self._stage_compression(cur, insts)
            elif effect == "imager":
                y = self._stage_imager(cur, insts)
            else:
                raise ValueError(f"unsupported batched effect: {effect}")
            cur = jnp.where(skip[:, None, None], cur, y)
        return cur

    def normalize_stems(self, stems: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        insts = list(stems.keys())
        T = max(v.shape[-1] for v in stems.values())
        x = np.stack(
            [
                np.pad(np.asarray(v, np.float32), ((0, 0), (cfg.fft_size, cfg.fft_size + T - v.shape[-1])))
                for v in stems.values()
            ]
        )  # [S, 2, T + 2*fft]
        lengths = {i: stems[i].shape[-1] for i in insts}
        length_list = [lengths[i] for i in insts]

        cur = self.normalize_device(jnp.asarray(x), insts, length_list)
        out_np = np.asarray(cur)
        return {
            inst: out_np[s, :, cfg.fft_size : cfg.fft_size + lengths[inst]]
            for s, inst in enumerate(insts)
        }

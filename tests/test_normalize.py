"""FX-normalization tests: loudness/EQ/compression/imager matching."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.config import NormalizationConfig
from music_mixing_style_transfer_tpu.normalize import (
    AudioEffectsNormalizer,
    eq_match,
    measure_mean_peak,
    normalize_imager,
    process_balance,
)
from music_mixing_style_transfer_tpu.ops import integrated_loudness

FEATURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "music_mixing_style_transfer_tpu",
    "weights",
    "musdb18_fxfeatures_eqcompimagegain.npy",
)

SR = 44100


@pytest.fixture(scope="module")
def normalizer():
    return AudioEffectsNormalizer(FEATURES)


def _music_like(rng, seconds=3.0, channels=2):
    """Broadband noise with some tonal content and onsets."""
    T = int(SR * seconds)
    t = np.arange(T) / SR
    x = 0.1 * rng.standard_normal((channels, T))
    x += 0.2 * np.sin(2 * np.pi * 220 * t)[None, :]
    env = (np.sin(2 * np.pi * 2.0 * t) > 0.6).astype(np.float32)
    x *= 0.3 + env[None, :]
    return (x * 0.3).astype(np.float32)


def test_feature_loading(normalizer):
    f = normalizer.features
    assert set(f.keys()) >= {"eq", "compression", "imager", "loudness"}
    assert f["eq"]["vocals"].shape == (32769,)
    # loudness targets from the shipped file
    assert -30 < float(np.ravel(f["loudness"]["vocals"])[0]) < -20


def test_loudness_stage_hits_target(normalizer, rng):
    x = _music_like(rng)
    y = normalizer.normalize_audio_per_effect(x, "vocals", "loudness")
    target = float(np.ravel(normalizer.features["loudness"]["vocals"])[0])
    out = float(integrated_loudness(jnp.asarray(y.T), SR))
    assert abs(out - target) < 0.5
    assert y.shape == x.shape


def test_eq_stage_moves_spectrum_toward_target(normalizer, rng):
    from music_mixing_style_transfer_tpu.normalize.matching import (
        amp_to_db,
        average_magnitude_spectrum,
    )

    cfg = normalizer.cfg
    x = _music_like(rng, seconds=4.0)
    y = normalizer.normalize_audio_per_effect(x, "vocals", "eq")
    assert y.shape == x.shape

    ref = normalizer.features["eq"]["vocals"]
    pad = np.pad(x, ((0, 0), (cfg.fft_size, cfg.fft_size)))
    pady = np.pad(y, ((0, 0), (cfg.fft_size, cfg.fft_size)))
    sx = np.asarray(average_magnitude_spectrum(jnp.asarray(pad[0]), cfg.fft_size, cfg.hop_length))
    sy = np.asarray(average_magnitude_spectrum(jnp.asarray(pady[0]), cfg.fft_size, cfg.hop_length))
    # distance to target curve (in dB, over the audible band) should shrink
    band = slice(10, 20000)
    ref_db = amp_to_db(ref[band])

    def dist(s):
        d = amp_to_db(s[band]) - ref_db
        return np.mean(np.abs(d - np.mean(d)))  # shape distance, gain-invariant

    assert dist(sy) < dist(sx)


def test_mean_peak_feature(rng):
    x = _music_like(rng, seconds=2.0)[0]
    mean, std = measure_mean_peak(jnp.asarray(x))
    assert np.isfinite(float(mean))
    assert float(mean) < 0.0  # dB of |x|<1
    # louder signal -> higher mean peak
    mean2, _ = measure_mean_peak(jnp.asarray(x * 2))
    assert float(mean2) > float(mean)


def test_compression_stage_runs(normalizer, rng):
    x = _music_like(rng, seconds=2.0)
    y = normalizer.normalize_audio_per_effect(x, "drums", "compression")
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_process_balance():
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal(1000).astype(np.float32) * 0.1)
    n1, n2 = process_balance(d1, d2, tgt_e1_bal=0.3)
    e1 = float(jnp.sum(n1**2))
    e2 = float(jnp.sum(n2**2))
    assert abs(e1 / (e1 + e2) - 0.3) < 0.01


def test_imager_normalization_balances_midside(rng):
    x = _music_like(rng, seconds=1.0)
    x[1] = x[0] * 0.95 + 0.05 * rng.standard_normal(x.shape[1]).astype(np.float32)
    target = 0.85
    y = np.asarray(normalize_imager(jnp.asarray(x), target_side_mid_bal=target))
    mid, side = y[0] + y[1], y[0] - y[1]
    bal = np.sum(side**2) / (np.sum(mid**2) + np.sum(side**2))
    # normalize_imager's target is the *side* fraction of ms energy
    assert abs(bal - (1 - target)) < 0.05 or abs(bal - target) < 0.05


def test_full_normalization_chain(normalizer, rng):
    x = _music_like(rng, seconds=2.0)
    y = normalizer.normalize_audio(x, "other")
    assert y.shape == x.shape
    assert np.isfinite(y).all()
    target = float(np.ravel(normalizer.features["loudness"]["other"])[0])
    out = float(integrated_loudness(jnp.asarray(y.T), SR))
    assert abs(out - target) < 1.0


def test_silent_input_skipped(normalizer):
    x = np.zeros((2, SR), np.float32)
    y = normalizer.normalize_audio(x, "bass")
    np.testing.assert_allclose(y, x)


def test_panning_match_moves_toward_target(rng):
    """panning_match should steer the SPS-derived panning toward the target."""
    import jax.numpy as jnp
    from music_mixing_style_transfer_tpu.normalize.matching import panning_match, _sps

    T = SR
    noise = (rng.standard_normal(T) * 0.2).astype(np.float32)
    panned = np.stack([noise * 1.5, noise * 0.5 + 0.02 * rng.standard_normal(T).astype(np.float32)])
    ref_phi = np.full(1025, 0.98, np.float32)  # near-centered target
    y = np.asarray(panning_match(jnp.asarray(panned), ref_phi))
    assert y.shape == panned.shape
    assert np.isfinite(y).all()

    def lr_ratio(a):
        return np.sum(a[0] ** 2) / (np.sum(a[1] ** 2) + 1e-12)

    # output left/right balance should be closer to 1 than the input's
    assert abs(np.log(lr_ratio(y))) < abs(np.log(lr_ratio(panned)))


def test_batched_normalizer_matches_per_stem(normalizer, rng):
    """Batched multi-stem path == sequential per-stem path (same stage math)."""
    stems = {
        "drums": _music_like(rng, seconds=1.5),
        "vocals": _music_like(rng, seconds=1.5) * 0.5,
    }
    # per-stem reference path
    seq = {i: normalizer.normalize_audio(v, src=i) for i, v in stems.items()}
    # batched path
    bat = normalizer.normalize_stems(stems)
    for i in stems:
        ref_rms = np.sqrt(np.mean(seq[i] ** 2))
        err = np.sqrt(np.mean((seq[i] - bat[i]) ** 2))
        assert err / (ref_rms + 1e-12) < 0.05, f"{i}: nrmse {err/ref_rms}"


def test_batched_stages_match_per_stem_tightly(normalizer, rng):
    """Per-stage equivalence of the batched path vs the sequential path."""
    from music_mixing_style_transfer_tpu.normalize.batch import (
        BatchedAudioEffectsNormalizer,
    )

    cfg = normalizer.cfg
    stems = {
        "drums": _music_like(rng, seconds=1.0),
        "vocals": _music_like(rng, seconds=1.0) * 0.6,
    }
    b = BatchedAudioEffectsNormalizer(normalizer.features, cfg)
    insts = list(stems.keys())
    T = stems["drums"].shape[-1]
    x = np.stack(
        [np.pad(v, ((0, 0), (cfg.fft_size, cfg.fft_size))) for v in stems.values()]
    )

    lengths = [stems[i].shape[-1] for i in insts]
    for effect, tol in [("loudness", 1e-4), ("eq", 2e-2), ("imager", 1e-3)]:
        args = (jnp.asarray(x), insts) + ((lengths,) if effect == "eq" else ())
        batched = np.asarray(getattr(b, f"_stage_{effect}")(*args))
        for s, inst in enumerate(insts):
            seq = normalizer.normalize_audio_per_effect(stems[inst], inst, effect)
            got = batched[s, :, cfg.fft_size : cfg.fft_size + T]
            rms = np.sqrt(np.mean(seq**2)) + 1e-12
            nrmse = np.sqrt(np.mean((got - seq) ** 2)) / rms
            assert nrmse < tol, f"{effect}/{inst}: nrmse {nrmse}"


def test_batched_normalizer_silent_channel_no_nan(normalizer):
    """A silent channel inside a loud stem must pass through unchanged, not
    poison the whole stem with NaNs (review finding: -inf LUFS -> inf gain)."""
    from music_mixing_style_transfer_tpu.normalize.batch import (
        BatchedAudioEffectsNormalizer,
    )

    rng = np.random.default_rng(3)
    loud = (rng.standard_normal(44100) * 0.2).astype(np.float32)
    stems = {
        "bass": np.stack([loud, np.zeros(44100, np.float32)]),
        "drums": (rng.standard_normal((2, 44100)) * 0.2).astype(np.float32),
    }
    cfg = dataclasses.replace(normalizer.cfg, stems=("bass", "drums"))
    b = BatchedAudioEffectsNormalizer(normalizer.features, cfg)
    out = b.normalize_stems(stems)
    for inst, y in out.items():
        assert np.isfinite(y).all(), f"{inst} contains non-finite samples"
        assert np.abs(y).max() <= 1.5  # no runaway gains either
    # note: the imager stage legitimately remixes mid/side into the silent
    # channel (stereo-image normalization is a 2-channel operation); the
    # guarantee here is no NaN/inf poisoning, matching finite stages


def test_batched_eq_not_diluted_by_short_stem(normalizer):
    """Stems zero-padded to the longest length must not have their average
    spectrum diluted (review finding: spurious broadband EQ boost)."""
    from music_mixing_style_transfer_tpu.normalize.batch import (
        BatchedAudioEffectsNormalizer,
    )

    rng = np.random.default_rng(5)
    long_t, short_t = 3 * 2**16, 2**16
    short = (rng.standard_normal((2, short_t)) * 0.2).astype(np.float32)
    cfg = dataclasses.replace(
        normalizer.cfg, stems=("drums", "vocals"), effects=("eq",)
    )
    b = BatchedAudioEffectsNormalizer(normalizer.features, cfg)
    # same short stem processed alone vs alongside a 3x longer one
    alone = b.normalize_stems(
        {"vocals": short, "drums": short.copy()}
    )["vocals"]
    padded = b.normalize_stems(
        {
            "vocals": short,
            "drums": (rng.standard_normal((2, long_t)) * 0.2).astype(np.float32),
        }
    )["vocals"]
    # identical input -> near-identical EQ regardless of co-batched lengths
    denom = np.abs(alone).max()
    assert np.abs(alone - padded).max() / denom < 0.05


def test_lufs_normalize_silent_passthrough():
    from music_mixing_style_transfer_tpu.ops.loudness import lufs_normalize

    x = jnp.zeros((1000, 2), jnp.float32)
    y = np.asarray(lufs_normalize(x, 44100, -20.0))
    assert np.isfinite(y).all() and np.abs(y).max() == 0.0


def test_stream_peaks_matches_fullpass(rng):
    """The slab-streaming candidate sweep (_stream_peaks_batch) must produce
    the same peaks feature as a direct full-length compress+measure pass —
    the envelope carry across slabs and the unconditional clip are exact."""
    from music_mixing_style_transfer_tpu.normalize.batch import _stream_peaks_batch
    from music_mixing_style_transfer_tpu.normalize.matching import measure_mean_peak
    from music_mixing_style_transfer_tpu.ops.compressor import compress_and_clip

    N, Gc, T = 2, 3, 140_000  # crosses slab boundaries at slab_T = 2^16
    x = (rng.standard_normal((N, T)) * 0.25).astype(np.float32)
    ratios = np.asarray([[2.0, 3.0, 4.0], [1.5, 2.5, 0.5]], np.float32)
    ths = np.asarray([[-20.0, -25.0, -30.0], [-15.0, -22.0, -28.0]], np.float32)
    attacks = np.asarray([10.0, 5.0], np.float32)
    releases = np.asarray([100.0, 60.0], np.float32)

    pk = np.asarray(
        _stream_peaks_batch(
            jnp.asarray(x), ratios, ths, attacks, releases, 44100,
            percentile=75.0, slab_T=1 << 16,
        )
    )

    xg = np.broadcast_to(x[:, None, :], (N, Gc, T)).reshape(N * Gc, T)
    y = compress_and_clip(
        jnp.asarray(xg),
        jnp.asarray(ths.reshape(-1)),
        jnp.asarray(np.repeat(attacks, Gc)),
        jnp.asarray(np.repeat(releases, Gc)),
        jnp.asarray(ratios.reshape(-1)),
        44100,
    )
    ref, _ = measure_mean_peak(y, percentile=75.0)
    np.testing.assert_allclose(pk, np.asarray(ref).reshape(N, Gc), rtol=0, atol=1e-3)


def test_comp_fallback_sweep_matches_fullwidth(normalizer):
    """The rare host-stepped sweep (first satisfying candidate beyond the
    first lane block) must select exactly what one full-width device pass
    selects — and an empty mode grid (narrow comp configs) must fall
    through uncompressed instead of crashing (regression)."""
    import music_mixing_style_transfer_tpu.normalize.batch as batch_mod
    import music_mixing_style_transfer_tpu.ops.pallas.envelope as env_mod
    from music_mixing_style_transfer_tpu.normalize.batch import (
        BatchedAudioEffectsNormalizer,
    )

    # small grid so the full-width reference pass stays CPU-cheap; this
    # config also produces an EMPTY down-grid for some base ratios
    cfg = dataclasses.replace(normalizer.cfg, comp_min_th=-20.0, comp_max_ratio=5)
    b = BatchedAudioEffectsNormalizer(normalizer.features, cfg)

    rng = np.random.default_rng(11)
    T = 2**14
    # extreme crest factor: mean-peak far above the target band, so the
    # match (if any) sits deep in the candidate grid
    x = (rng.standard_normal((2, T)) * 0.002).astype(np.float32)
    for k in range(14):
        x[:, 500 + k * 1100] = 0.9
    stems = np.stack([x, (rng.standard_normal((2, T)) * 0.1).astype(np.float32)])
    fft = cfg.fft_size
    xpad = jnp.asarray(np.stack([np.pad(s, ((0, 0), (fft, fft))) for s in stems]))

    orig = BatchedAudioEffectsNormalizer._comp_host_sweep
    calls = []

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    BL = env_mod.BLOCK_LANES
    BatchedAudioEffectsNormalizer._comp_host_sweep = spy
    env_mod.BLOCK_LANES = 32  # Gc = 8 candidates per pass -> chunked sweep
    try:
        out_chunked = np.asarray(b._stage_compression(xpad, ["drums", "vocals"]))
    finally:
        env_mod.BLOCK_LANES = BL
        BatchedAudioEffectsNormalizer._comp_host_sweep = orig
    assert calls, "probe no longer exercises the fallback sweep"

    env_mod.BLOCK_LANES = 1 << 20  # whole grid in one device pass
    try:
        out_full = np.asarray(b._stage_compression(xpad, ["drums", "vocals"]))
    finally:
        env_mod.BLOCK_LANES = BL
    np.testing.assert_array_equal(out_chunked, out_full)


def test_design_eq_fir_batch_matches_scipy():
    """Device-resident FIR design == scipy.signal.firwin2 (f32 precision)."""
    from music_mixing_style_transfer_tpu.normalize.matching import (
        design_eq_fir,
        design_eq_fir_batch,
    )

    rng = np.random.default_rng(0)
    m = 4097  # smaller grid for test speed; same construction
    a = np.abs(rng.standard_normal((3, m))) + 0.01
    r = np.abs(rng.standard_normal((3, m))) + 0.01
    ref = np.stack([design_eq_fir(a[i], r[i], ntaps=301) for i in range(3)])
    got = np.asarray(
        design_eq_fir_batch(jnp.asarray(a, jnp.float32), jnp.asarray(r, jnp.float32), ntaps=301)
    )
    assert np.max(np.abs(ref - got)) / np.max(np.abs(ref)) < 1e-4

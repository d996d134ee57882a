"""Benchmark: whole-song mixing-style-transfer throughput on one chip.

Two measurements (reference ``style_transfer.py:112-177`` semantics):

1. **model-only RTF** — jitted FXencoder (reference segments) + MixFXcloner
   (input segments) at production shapes (2^19-sample segments), bf16 and
   f32: the pure device compute ceiling.
2. **end-to-end RTF** — a real whole song (the reference repo's shipped
   sample stems, tiled to ~60 s) through the production ``run_directory``
   path: WAV read + batched FX normalization + segmentation + encoder
   embedding mean + converter + reassembly + WAV write, i.e. everything a
   user's CLI run does after checkpoint load. Reported for the
   device-resident PCM fast path (``e2e_rtf``, the default), for 32-bit
   float WAV sources through the same device-resident stages after a
   float32 upload (``e2e_f32src_rtf`` — the path non-16-bit inputs take;
   2x the int16 upload bytes), and for the per-stage host path
   (``e2e_host_rtf``, the legacy ``--pcm_fast_path false`` route).
3. **feature-extraction RTF** — the ``feature_extraction`` CLI hot path
   (segment + encode + mean embedding).

Also covers the remaining BASELINE.json configs: two-reference latent
interpolation (``interp_rtf``), batched FXmanipulator augmentation
throughput (``augment_audio_s_per_s``), and full-size training-step
throughput for both models (``train_*_audio_s_per_s``).

Prints ONE JSON line; ``value`` stays the headline bf16 model RTF
(driver contract), with the honest numbers alongside:
  {"metric": "style_transfer_rtf", "value": ..., "unit": "x_realtime",
   "vs_baseline": value/50, "model_rtf_f32": ..., "e2e_rtf": ...,
   "e2e_host_rtf": ..., "feature_rtf": ..., "interp_rtf": ...,
   "augment_audio_s_per_s": ..., "train_contrastive_audio_s_per_s": ...,
   "train_converter_audio_s_per_s": ...}
(baseline: the north-star RTF >= 50x from BASELINE.md.)

The e2e/feature/interp configs run ``--repeats`` (default 3) timed passes
each; the JSON value is the MEDIAN and a ``<key>_spread`` field carries
``[min, max]`` — the serving tunnel's run-to-run variance is real (single
shots drifted e2e 13.4->12.1, feature 204->151 between rounds with no code
cause), so a single sample cannot distinguish regression from weather.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

SEG = 2**19  # reference production segment length (style_transfer.py:362)
SR = 44100
SAMPLES = "/root/reference/samples"


def model_only_rtf(args, dtype_str: str) -> float:
    import jax
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.models import FXencoder, MixFXcloner
    from music_mixing_style_transfer_tpu.models.fast_init import fast_init

    B = args.batch
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32

    enc = FXencoder()
    tcn = MixFXcloner()
    ev = fast_init(enc, jnp.zeros((1, 2, 2**14)))
    cv = fast_init(tcn, jnp.zeros((1, 2, 2**14)), jnp.zeros((1, 2048)))
    if dtype != jnp.float32:
        ev = jax.tree.map(lambda a: a.astype(dtype), ev)
        cv = jax.tree.map(lambda a: a.astype(dtype), cv)

    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.standard_normal((B, 2, SEG)).astype(np.float32) * 0.1)
    x_ref = jnp.asarray(rng.standard_normal((B, 2, SEG)).astype(np.float32) * 0.1)

    @jax.jit
    def style_transfer_step(ev, cv, x_ref, x_in):
        # reference-style: mean embedding over reference segments, then
        # convert every input segment conditioned on it
        emb = enc.apply(ev, x_ref.astype(dtype)).astype(jnp.float32)
        emb = jnp.mean(emb, axis=0)
        cond = jnp.broadcast_to(emb[None].astype(dtype), (x_in.shape[0], emb.shape[0]))
        return tcn.apply(cv, x_in.astype(dtype), cond)

    # warm up / compile + sanity: the computation must be finite
    out = style_transfer_step(ev, cv, x_ref, x_in)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), "non-finite output"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = style_transfer_step(ev, cv, x_ref, x_in)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # device sync
    dt = (time.perf_counter() - t0) / args.iters

    return B * SEG / SR / dt


def _tiled_song_stems(
    name_dir: str, seconds: float, out_dir: str, tag: str, sampwidth: int = 2
):
    """Tile the ~15 s reference sample stems to ``seconds`` and write them to
    disk (as ``<out_dir>/<inst>.wav``) so the benched path includes real WAV
    reads. ``sampwidth=4`` writes 32-bit PCM to bench the float-source
    route."""
    import wave

    from music_mixing_style_transfer_tpu.data.wavio import read_wav_stereo_ct, write_wav

    paths = {}
    T = int(seconds * SR)
    for inst in ("drums", "bass", "other", "vocals"):
        x = read_wav_stereo_ct(os.path.join(name_dir, inst + ".wav"))
        reps = int(np.ceil(T / x.shape[1]))
        x = np.tile(x, (1, reps))[:, :T]
        p = os.path.join(out_dir, inst + ".wav")
        if sampwidth == 4:
            pcm = np.clip(
                np.round(x.T * 2.0**31), -(2.0**31), 2.0**31 - 1
            ).astype("<i4")
            with wave.open(p, "w") as w:
                w.setnchannels(2)
                w.setsampwidth(4)
                w.setframerate(SR)
                w.writeframes(np.ascontiguousarray(pcm).tobytes())
        else:
            write_wav(p, x.T)
        paths[inst] = p
    return paths


def e2e_rtf(args) -> dict:
    """Whole-song style transfer through the production CLI path
    (``run_directory``): WAV read, FX normalization, segmentation, encoder
    embedding mean, converter, reassembly, WAV write. Times both the
    device-resident PCM fast path (the production default) and the
    per-stage host path (``--pcm_fast_path false``)."""
    import dataclasses

    from music_mixing_style_transfer_tpu.config import InferenceConfig, NormalizationConfig
    from music_mixing_style_transfer_tpu.data.wavio import read_wav_stereo_ct
    from music_mixing_style_transfer_tpu.infer.pipeline import (
        MixingStyleTransfer,
        StyleTransferEngine,
    )
    from music_mixing_style_transfer_tpu.normalize import AudioEffectsNormalizer

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "music_mixing_style_transfer_tpu", "weights")
    tmp = "/tmp/bench_e2e"
    # two songs: run_directory pipelines host I/O + PCM upload of song i+1
    # under song i's in-flight device work, so the 2-song aggregate measures
    # the production serving throughput, not one song's serial latency.
    # "songs" holds 16-bit sources (int16 PCM upload); "songs_f32" the same
    # audio as 32-bit WAVs (float32 upload route for non-16-bit sources).
    for root, width in (("songs", 2), ("songs_f32", 4)):
        for si in range(2):
            song = os.path.join(tmp, root, f"song{si}", "separated", "mdx_extra")
            _tiled_song_stems(
                f"{SAMPLES}/style_transfer/#0/separated/mdx_extra/input",
                args.seconds, _ensure(os.path.join(song, "input")), "input",
                sampwidth=width,
            )
            _tiled_song_stems(
                f"{SAMPLES}/interpolation/#0/separated/mdx_extra/reference",
                args.seconds, _ensure(os.path.join(song, "reference")), "reference",
                sampwidth=width,
            )

    normalizer = AudioEffectsNormalizer(
        os.path.join(here, "musdb18_fxfeatures_eqcompimagegain.npy"),
        NormalizationConfig(),
    )
    engine = StyleTransferEngine(dtype=args.dtype)
    out = {}
    variants = [
        ("e2e_rtf", True, "songs"),
        ("e2e_f32src_rtf", True, "songs_f32"),
        ("e2e_host_rtf", False, "songs"),
    ]
    for key, fast, root in variants:
        if key == "e2e_host_rtf" and args.skip_e2e_host:
            continue
        cfg = InferenceConfig(
            batch_size=args.batch, dtype=args.dtype, pcm_fast_path=fast
        )
        pipeline = MixingStyleTransfer(engine, cfg, normalizer=normalizer)

        def run():
            t0 = time.perf_counter()
            written = pipeline.run_directory(
                os.path.join(tmp, root), os.path.join(tmp, "out_" + root)
            )
            dt = time.perf_counter() - t0
            assert len(written) == 2
            for w in written:
                y = read_wav_stereo_ct(w)
                assert np.isfinite(y).all() and np.abs(y).max() > 1e-4
            return dt

        run()  # compile + cache warmup (all shapes identical on 2nd run)
        vals = [2 * args.seconds / run() for _ in range(args.repeats)]
        out[key] = float(np.median(vals))
        out[key + "_spread"] = [round(min(vals), 1), round(max(vals), 1)]
    return out


def _ensure(d: str) -> str:
    os.makedirs(d, exist_ok=True)
    return d


def interp_rtf(args) -> float:
    """Two-reference latent-interpolation style transfer, end to end
    (BASELINE.json config 3; reference ``--interpolation`` mode,
    ``inference/style_transfer.py:214-252``): N latent chunks blended
    between reference A and reference B embeddings, through the same
    production ``run_directory`` path as ``e2e_rtf``."""
    import dataclasses

    from music_mixing_style_transfer_tpu.config import InferenceConfig, NormalizationConfig
    from music_mixing_style_transfer_tpu.data.wavio import read_wav_stereo_ct
    from music_mixing_style_transfer_tpu.infer.pipeline import (
        MixingStyleTransfer,
        StyleTransferEngine,
    )
    from music_mixing_style_transfer_tpu.normalize import AudioEffectsNormalizer

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "music_mixing_style_transfer_tpu", "weights")
    tmp = "/tmp/bench_interp"
    for si in range(2):
        song = os.path.join(tmp, "songs", f"song{si}", "separated", "mdx_extra")
        _tiled_song_stems(
            f"{SAMPLES}/style_transfer/#0/separated/mdx_extra/input",
            args.seconds, _ensure(os.path.join(song, "input")), "input",
        )
        _tiled_song_stems(
            f"{SAMPLES}/interpolation/#0/separated/mdx_extra/reference",
            args.seconds, _ensure(os.path.join(song, "reference")), "reference",
        )
        _tiled_song_stems(
            f"{SAMPLES}/interpolation/#0/separated/mdx_extra/reference_B",
            args.seconds, _ensure(os.path.join(song, "reference_B")), "reference_B",
        )

    normalizer = AudioEffectsNormalizer(
        os.path.join(here, "musdb18_fxfeatures_eqcompimagegain.npy"),
        NormalizationConfig(),
    )
    engine = StyleTransferEngine(dtype=args.dtype)
    cfg = InferenceConfig(batch_size=args.batch, dtype=args.dtype, interpolation=True)
    pipeline = MixingStyleTransfer(engine, cfg, normalizer=normalizer)

    def run():
        t0 = time.perf_counter()
        written = pipeline.run_directory(
            os.path.join(tmp, "songs"), os.path.join(tmp, "out")
        )
        dt = time.perf_counter() - t0
        assert len(written) == 2
        for w in written:
            y = read_wav_stereo_ct(w)
            assert np.isfinite(y).all() and np.abs(y).max() > 1e-4
        return dt

    run()  # compile + warmup
    vals = [2 * args.seconds / run() for _ in range(args.repeats)]
    return float(np.median(vals)), [round(min(vals), 1), round(max(vals), 1)]


def augment_rtf(args) -> float:
    """Batched FX-manipulation augmentation throughput (BASELINE.json
    config 4): the full per-instrument FXmanipulator chains (EQ, comp,
    pan, imager, gain, reverb sends — reference
    ``audio_effects_chain.py:99-164``) applied on device at contrastive
    training batch shapes. Returns manipulated audio-seconds per second."""
    import jax
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.data.datasets import PAD_B4_MANIPULATION
    from music_mixing_style_transfer_tpu.fx import make_instrument_manipulators
    from music_mixing_style_transfer_tpu.train.fused import augment_contrastive_views

    insts = ("drums", "bass", "other", "vocals")
    manipulators = make_instrument_manipulators(insts)
    pad = PAD_B4_MANIPULATION
    L = 2**17
    load_len = L + 2 * pad
    items, K = 4, 2  # batch_items x (1 + strong negatives), train defaults

    rng = np.random.default_rng(0)
    segs = jnp.asarray(
        (rng.standard_normal((len(insts), items, 2, 2, load_len)) * 3000).astype(
            np.int16
        )
    )
    keys = jnp.asarray(
        rng.integers(0, 2**32, size=(len(insts), items, K, 2), dtype=np.uint32)
    )

    fn = jax.jit(
        lambda s, k: augment_contrastive_views(manipulators, insts, s, k, pad)
    )
    a, b = fn(segs, keys)  # compile
    assert bool(jnp.isfinite(a).all() & jnp.isfinite(b).all())

    iters = max(2, args.iters // 2)
    t0 = time.perf_counter()
    for _ in range(iters):
        a, b = fn(segs, keys)
    _ = float(jnp.sum(a[..., :8]) + jnp.sum(b[..., :8]))  # one sync
    dt = (time.perf_counter() - t0) / iters
    # each (item, k) FX draw manipulates BOTH content segments at load_len
    return len(insts) * items * K * 2 * load_len / SR / dt


def train_step_throughput(args) -> dict:
    """Production train-step throughput (BASELINE.json config 5) — the
    same measurements as ``tools/train_bench.py`` at full model size,
    reported as training audio-seconds per second."""
    import argparse as _ap

    from music_mixing_style_transfer_tpu.tools.train_bench import (
        bench_contrastive,
        bench_converter,
    )

    ta = _ap.Namespace(
        steps=max(3, args.iters // 2), batch=4, length=2**17,
        dtype=args.dtype, remat=False, tiny=False,
    )
    c = bench_contrastive(ta)
    v = bench_converter(ta)
    return {
        "train_contrastive_audio_s_per_s": c["contrastive_audio_s_per_s"],
        "train_contrastive_step_s": c["contrastive_step_s"],
        "train_converter_audio_s_per_s": v["converter_audio_s_per_s"],
        "train_converter_step_s": v["converter_step_s"],
    }


def feature_rtf(args) -> float:
    """Feature-extraction CLI hot path: segment + encode + mean embedding."""
    from music_mixing_style_transfer_tpu.data.wavio import read_wav_stereo_ct_i16
    from music_mixing_style_transfer_tpu.infer.pipeline import StyleTransferEngine

    engine = StyleTransferEngine(dtype=args.dtype)
    x = read_wav_stereo_ct_i16(
        "/tmp/bench_e2e/songs/song0/separated/mdx_extra/input/other.wav"
    )
    engine.embed_song(x, SEG)  # warmup
    vals = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        emb = engine.embed_song(x, SEG)
        vals.append(x.shape[1] / SR / (time.perf_counter() - t0))
    assert np.isfinite(emb).all()
    return float(np.median(vals)), [round(min(vals), 1), round(max(vals), 1)]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16, help="segments per forward")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--seconds", type=float, default=60.0, help="e2e song length")
    p.add_argument("--repeats", type=int, default=3,
                   help="timed repeats per e2e/feature/interp config; the "
                        "JSON reports the median plus a [min, max] spread "
                        "(the tunnel's run-to-run variance is real — single "
                        "shots drifted 10-40%% across rounds)")
    p.add_argument("--skip_e2e", action="store_true")
    p.add_argument("--skip_e2e_host", action="store_true",
                   help="skip the (slow) per-stage host-path e2e comparison")
    p.add_argument("--skip_extras", action="store_true",
                   help="skip interpolation / augmentation / train-step "
                        "configs (BASELINE.json configs 3-5)")
    args = p.parse_args()

    from music_mixing_style_transfer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    rtf_bf16 = model_only_rtf(args, "bfloat16")
    rtf_f32 = model_only_rtf(args, "float32")

    extra = {}
    if not args.skip_e2e and os.path.isdir(SAMPLES):
        e2e = e2e_rtf(args)
        extra.update(
            {k: (round(v, 1) if isinstance(v, float) else v) for k, v in e2e.items()}
        )
        extra["feature_rtf"], extra["feature_rtf_spread"] = feature_rtf(args)
        extra["feature_rtf"] = round(extra["feature_rtf"], 1)
        if not args.skip_extras:
            extra["interp_rtf"], extra["interp_rtf_spread"] = interp_rtf(args)
            extra["interp_rtf"] = round(extra["interp_rtf"], 1)
    if not args.skip_extras:
        extra["augment_audio_s_per_s"] = round(augment_rtf(args), 1)
        extra.update(train_step_throughput(args))

    print(
        json.dumps(
            {
                "metric": "style_transfer_rtf",
                "value": round(rtf_bf16, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtf_bf16 / 50.0, 2),
                "model_rtf_f32": round(rtf_f32, 1),
                **extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

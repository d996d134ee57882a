"""Inference-path profiling: per-stage normalize timing + transfer-path
phase breakdown (upload / normalize / embed / convert / download).

Complements ``bench.py`` (which reports headline RTFs) by attributing the
end-to-end wall time of the device-resident whole-song path — run it on the
real chip to find the current bottleneck before optimizing anything.

Run: ``python -m music_mixing_style_transfer_tpu.tools.infer_prof
[--seconds 60] [--dtype bfloat16] [--stems /path/to/stem_dir]``
(default stems: synthesized music-like noise).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

SR = 44100


def _sync(a):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(a[..., :16]).astype(jnp.float32)))


def _stems(args):
    rng = np.random.default_rng(1)
    T = int(args.seconds * SR)
    if args.stems:
        from ..data.wavio import read_wav_stereo_ct_i16

        out = []
        for inst in ("drums", "bass", "other", "vocals"):
            x = read_wav_stereo_ct_i16(os.path.join(args.stems, inst + ".wav"))
            reps = -(-T // x.shape[1])
            out.append(np.tile(x, (1, reps))[:, :T])
        return np.stack(out)
    env = (np.sin(2 * np.pi * np.arange(T) / 22050) > 0.7).astype(np.float32)
    return (
        rng.standard_normal((4, 2, T)) * (0.05 + 0.4 * env) * 20000
    ).astype(np.int16)


def profile_normalize(args, normalizer, stems_pcm) -> dict:
    import jax.numpy as jnp

    b = normalizer.batched()
    cfg = b.cfg
    insts = ["drums", "bass", "other", "vocals"]
    T = stems_pcm.shape[-1]
    x = stems_pcm.astype(np.float32) / 32768.0
    xd = jnp.pad(jnp.asarray(x), ((0, 0), (0, 0), (cfg.fft_size, cfg.fft_size)))
    lens = [T] * 4
    out = {}
    for rep in range(2):
        cur = xd
        for effect in cfg.effects:
            t0 = time.perf_counter()
            if effect == "loudness":
                cur = b._stage_loudness(cur, insts)
            elif effect == "eq":
                cur = b._stage_eq(cur, insts, lens)
            elif effect == "compression":
                cur = b._stage_compression(cur, insts)
            elif effect == "imager":
                cur = b._stage_imager(cur, insts)
            _sync(cur)
            out[f"norm_{effect}_s"] = round(time.perf_counter() - t0, 3)
    return out


def profile_transfer(args, pipe, normalizer) -> dict:
    import jax.numpy as jnp

    cfg = pipe.cfg
    insts = list(cfg.instruments)
    L = cfg.segment_length
    fft = normalizer.cfg.fft_size if normalizer else 0
    inp, ref = _stems(args), _stems(args)
    T = inp.shape[-1]
    pipe.transfer_song_pcm(inp, ref)  # compile warmup

    out = {}
    for rep in range(2):
        t0 = time.perf_counter()
        in_dev = jnp.asarray(inp)
        ref_dev = jnp.asarray(ref)
        _sync(in_dev)
        _sync(ref_dev)
        out["upload_s"] = round(time.perf_counter() - t0, 3)

        Tb = -(-T // L) * L
        t0 = time.perf_counter()
        if normalizer is not None:
            x = in_dev.astype(jnp.float32) * (1.0 / 32768.0)
            x = jnp.pad(x, ((0, 0), (0, 0), (fft, fft + Tb - T)))
            x = normalizer.batched().normalize_device(x, insts, [T] * len(insts))
            y_in = jnp.clip(x[:, :, fft : fft + Tb], -1.0, 1.0)
        else:
            y_in = jnp.pad(
                in_dev.astype(jnp.float32) * (1.0 / 32768.0),
                ((0, 0), (0, 0), (0, Tb - T)),
            )
        _sync(y_in)
        out["normalize_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        embs = pipe._embed_group_pcm(ref_dev, T)
        _sync(embs)
        out["embed_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        S = len(insts)
        n = Tb // L
        cond = jnp.repeat(embs, n, axis=0)
        segs = y_in.reshape(S, 2, n, L).transpose(0, 2, 1, 3).reshape(S * n, 2, L)
        B_in = pipe.engine._pad_bucket(S * n)
        segs = jnp.pad(segs, ((0, B_in - S * n), (0, 0), (0, 0)))
        cond = jnp.pad(cond, ((0, B_in - S * n), (0, 0)))
        y = pipe.engine._convert_multi(pipe.engine.conv_vars, segs, cond)
        y = y[: S * n].reshape(S, n, 2, L).transpose(0, 2, 1, 3).reshape(S, 2, n * L)
        mix = jnp.sum(y[:, :, :T], axis=0)
        pcm16 = jnp.clip(jnp.round(mix * 32768.0), -32768.0, 32767.0).astype(jnp.int16)
        _sync(pcm16)
        out["convert_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        np.asarray(pcm16)
        out["download_s"] = round(time.perf_counter() - t0, 3)
    total = sum(v for k, v in out.items() if k.endswith("_s"))
    out["total_s"] = round(total, 3)
    out["rtf"] = round(args.seconds / total, 1)
    return out


def main(argv=None) -> int:
    import jax

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--stems", type=str, default=None,
                   help="dir with {drums,bass,other,vocals}.wav (tiled to --seconds)")
    p.add_argument("--skip_normalize", action="store_true")
    args = p.parse_args(argv)

    from ..config import InferenceConfig, NormalizationConfig
    from ..infer.pipeline import MixingStyleTransfer, StyleTransferEngine
    from ..normalize import AudioEffectsNormalizer

    here = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights")
    normalizer = None
    if not args.skip_normalize:
        normalizer = AudioEffectsNormalizer(
            os.path.join(here, "musdb18_fxfeatures_eqcompimagegain.npy"),
            NormalizationConfig(),
        )
    engine = StyleTransferEngine(dtype=args.dtype)
    cfg = InferenceConfig(dtype=args.dtype, normalize_input=normalizer is not None)
    pipe = MixingStyleTransfer(engine, cfg, normalizer=normalizer)

    out = {"backend": jax.default_backend(), "dtype": args.dtype, "seconds": args.seconds}
    if normalizer is not None:
        out.update(profile_normalize(args, normalizer, _stems(args)))
    out.update(profile_transfer(args, pipe, normalizer))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

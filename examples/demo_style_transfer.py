"""Self-contained demo: synthesize stems, run the full style-transfer stack.

Creates two synthetic 'songs' (input + reference) in the reference directory
layout, FX-normalizes the input stems, transfers the reference's mixing style
with randomly-initialized models (substitute real checkpoints for musical
output), and writes the converted mixture.

    python examples/demo_style_transfer.py [--out /tmp/mst_demo]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_mixing_style_transfer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from music_mixing_style_transfer_tpu.config import InferenceConfig, NormalizationConfig
from music_mixing_style_transfer_tpu.data import write_wav
from music_mixing_style_transfer_tpu.infer import MixingStyleTransfer, StyleTransferEngine
from music_mixing_style_transfer_tpu.normalize import AudioEffectsNormalizer

SR = 44100


def synth_stem(rng, seconds, kind):
    t = np.arange(int(SR * seconds)) / SR
    if kind == "drums":
        env = (np.sin(2 * np.pi * 2.0 * t) > 0.9).astype(np.float32)
        x = env * rng.standard_normal(len(t)).astype(np.float32) * 0.5
    elif kind == "bass":
        x = 0.3 * np.sin(2 * np.pi * 55 * t) * (1 + 0.3 * np.sin(2 * np.pi * 0.5 * t))
    elif kind == "vocals":
        x = 0.2 * np.sin(2 * np.pi * (440 + 30 * np.sin(2 * np.pi * 3 * t)) * t)
    else:
        x = 0.15 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t))
    stereo = np.stack([x, np.roll(x, 7) * 0.9]).astype(np.float32)
    return np.clip(stereo, -1, 1)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mst_demo")
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    song = os.path.join(args.out, "song1")
    for name, seed in [("input", 0), ("reference", 1)]:
        r = np.random.default_rng(seed)
        for inst in ("drums", "bass", "other", "vocals"):
            x = synth_stem(r, args.seconds, inst)
            write_wav(os.path.join(song, "separated", name, inst + ".wav"), x.T, SR)
    print(f"synthesized stems under {song}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    feat = os.path.join(
        here, "music_mixing_style_transfer_tpu", "weights",
        "musdb18_fxfeatures_eqcompimagegain.npy",
    )
    cfg = InferenceConfig(
        segment_length=2**17, segment_length_ref=2**17,
        do_not_separate=True, save_each_inst=True, dtype=args.dtype,
    )
    engine = StyleTransferEngine(dtype=args.dtype)
    normalizer = AudioEffectsNormalizer(feat)
    pipeline = MixingStyleTransfer(engine, cfg, normalizer=normalizer)
    written = pipeline.run_directory(args.out + "/")
    print("wrote:", written)
    return 0


if __name__ == "__main__":
    sys.exit(main())

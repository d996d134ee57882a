"""Prepare a MUSDB-style corpus for training.

Produces the file layout the training datasets read
(``data/datasets.py:_MUSDBFiles``):

    <out>/<split>/<inst>_normalized_<order>_silence_trimmed<i>.wav
    <out>/<split>/<inst>_silence_trimmed<i>.wav        (--no_normalize)

from a decoded MUSDB directory ``<root>/<split>/<song>/{drums,bass,other,
vocals}.wav``. Per song: stems are FX-normalized toward the precomputed
average features (the same batched loudness/EQ/compression/imager chain the
inference pipeline uses — reference ``data_normalization.py``), then
silence-trimmed (RMS gate) and written as 16-bit PCM.

The reference repo ships no prep tool (its datasets, like ours, just expect
these files to exist); this closes the loop so training runs end-to-end
from raw MUSDB audio.

    python -m music_mixing_style_transfer_tpu.tools.prepare_musdb \
        --musdb_root /data/musdb18_decoded --output_dir /data/musdb_prepped
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence

import numpy as np

from ..config import NormalizationConfig
from ..data.prep import trim_silence
from ..data.wavio import read_wav, write_wav
from ..utils.logging import get_logger

log = get_logger("prepare_musdb")

INSTRUMENTS = ("drums", "bass", "other", "vocals")


def prepare_song(
    song_dir: str,
    out_dir: str,
    index: int,
    normalizer=None,
    order: str = "eqcompimagegain",
    instruments: Sequence[str] = INSTRUMENTS,
    silence_db: float = -60.0,
    sample_rate: int = 44100,
) -> int:
    """Normalize + silence-trim one song's stems; returns samples written."""
    stems = {}
    for inst in instruments:
        path = os.path.join(song_dir, f"{inst}.wav")
        if not os.path.exists(path):
            log.warning("missing stem %s — skipping song %s", path, song_dir)
            return 0
        audio, _ = read_wav(path, expected_rate=sample_rate)
        x = audio.T[:2] if audio.shape[1] >= 2 else np.repeat(audio.T, 2, 0)
        stems[inst] = np.asarray(x, np.float32)

    if normalizer is not None:
        stems = normalizer.normalize_stems(stems)
        suffix = f"normalized_{order}_silence_trimmed"
    else:
        suffix = "silence_trimmed"

    written = 0
    for inst in instruments:
        trimmed = trim_silence(np.clip(stems[inst], -1, 1), threshold_db=silence_db)
        if trimmed.shape[-1] == 0:
            log.warning("%s of %s is fully silent — skipped", inst, song_dir)
            continue
        write_wav(
            os.path.join(out_dir, f"{inst}_{suffix}{index}.wav"),
            trimmed.T,
            sample_rate,
        )
        written += trimmed.shape[-1]
    return written


def prepare_corpus(
    musdb_root: str,
    output_dir: str,
    splits: Sequence[str] = ("train", "test"),
    normalize: bool = True,
    feature_path: Optional[str] = None,
    order: str = "eqcompimagegain",
    instruments: Sequence[str] = INSTRUMENTS,
    silence_db: float = -60.0,
    sample_rate: int = 44100,
) -> int:
    normalizer = None
    if normalize:
        from ..normalize import AudioEffectsNormalizer

        if feature_path is None:
            feature_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "weights",
                "musdb18_fxfeatures_eqcompimagegain.npy",
            )
        normalizer = AudioEffectsNormalizer(
            feature_path,
            NormalizationConfig(stems=tuple(instruments)),
        )

    n_songs = 0
    for split in splits:
        split_dir = os.path.join(musdb_root, split)
        if not os.path.isdir(split_dir):
            log.warning("split %s not found under %s", split, musdb_root)
            continue
        out_dir = os.path.join(output_dir, split)
        os.makedirs(out_dir, exist_ok=True)
        songs = sorted(
            d for d in os.listdir(split_dir)
            if os.path.isdir(os.path.join(split_dir, d))
        )
        for i, song in enumerate(songs):
            n = prepare_song(
                os.path.join(split_dir, song), out_dir, i, normalizer,
                order, instruments, silence_db, sample_rate,
            )
            if n:
                n_songs += 1
                log.info("[%s] %s -> %d samples/stem", split, song, n)
    return n_songs


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--musdb_root", type=str, required=True,
                   help="decoded MUSDB: <root>/<split>/<song>/<inst>.wav")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--splits", type=str, nargs="+", default=["train", "test"])
    p.add_argument("--normalize", dest="normalize", action="store_true", default=True)
    p.add_argument("--no_normalize", dest="normalize", action="store_false")
    p.add_argument("--precomputed_normalization_feature", type=str, default=None)
    p.add_argument("--normalization_order", type=str, default="eqcompimagegain")
    p.add_argument("--instruments", type=str, nargs="+", default=list(INSTRUMENTS))
    p.add_argument("--silence_db", type=float, default=-60.0)
    p.add_argument("--sample_rate", type=int, default=44100)
    args = p.parse_args(argv)

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    n = prepare_corpus(
        args.musdb_root, args.output_dir, args.splits, args.normalize,
        args.precomputed_normalization_feature, args.normalization_order,
        args.instruments, args.silence_db, args.sample_rate,
    )
    log.info("prepared %d songs", n)
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())

"""Demucs separation contract (mock-subprocess — the binary is absent here).

The reference shells out to demucs and then consumes
``<song>/separated/<model>/<track-stem>/{drums,bass,other,vocals}.wav``
(``inference/style_transfer.py:82-90``). These tests pin that interface:
the exact argv our wrapper constructs, the error path when the binary is
missing, and — end to end through the CLI — that a mocked demucs producing
demucs' real output layout feeds the pipeline without any path surgery.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from music_mixing_style_transfer_tpu.data.wavio import (
    read_wav_stereo_ct,
    write_wav,
)
from music_mixing_style_transfer_tpu.infer.pipeline import separate_with_demucs

SR = 44100
INSTS = ("drums", "bass", "other", "vocals")


def test_separate_with_demucs_argv_and_missing_binary(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setattr(shutil, "which", lambda name: None)
    with pytest.raises(RuntimeError, match="demucs CLI not found"):
        separate_with_demucs("/x/song.wav", "/x/separated")

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/demucs")
    monkeypatch.setattr(
        subprocess, "run", lambda argv, check: calls.append((argv, check))
    )
    separate_with_demucs("/x/song.wav", "/x/separated", model="mdx_extra", device="cpu")
    assert calls == [
        (["demucs", "/x/song.wav", "-n", "mdx_extra", "-d", "cpu", "-o", "/x/separated"], True)
    ]


def _fake_demucs(argv, check):
    """Behave like ``demucs <song> -n <model> -d cpu -o <out>``: write the
    real demucs output layout ``<out>/<model>/<track-stem>/<inst>.wav``."""
    assert argv[0] == "demucs" and check
    song, model, out = argv[1], argv[argv.index("-n") + 1], argv[argv.index("-o") + 1]
    x = read_wav_stereo_ct(song)
    track = os.path.splitext(os.path.basename(song))[0]
    for k, inst in enumerate(INSTS):
        # any deterministic 4-way split whose stems sum back to the mixture
        write_wav(os.path.join(out, model, track, inst + ".wav"), (x * 0.25).T, SR)


def test_cli_invokes_separation_and_consumes_layout(monkeypatch, tmp_path, rng):
    """`--do_not_separate false` with no pre-separated stems: the CLI must
    call demucs once per missing track and the pipeline must then find the
    stems exactly where demucs put them (no directory reshuffling)."""
    from music_mixing_style_transfer_tpu.infer.style_transfer import main

    song = tmp_path / "song0"
    song.mkdir()
    T = 65536
    for name in ("input", "reference"):
        x = (rng.standard_normal((T, 2)) * 0.2).astype(np.float32)
        write_wav(str(song / (name + ".wav")), x, SR)

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/demucs")
    monkeypatch.setattr(subprocess, "run", _fake_demucs)

    argv = [
        "--target_dir", str(tmp_path) + "/",
        "--segment_length", "32768",
        "--segment_length_ref", "32768",
        "--do_not_separate", "false",
        "--normalize_input", "false",
    ]
    assert main(argv) == 0

    # demucs' layout was produced and consumed in place
    for name in ("input", "reference"):
        for inst in INSTS:
            assert (song / "separated" / "mdx_extra" / name / (inst + ".wav")).exists()
    out = song / "mixture_output_notnormed.wav"
    assert out.exists()
    y = read_wav_stereo_ct(str(out))
    assert y.shape == (2, T) and np.isfinite(y).all()

    # idempotence: stems exist now, so a re-run must SKIP separation
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: pytest.fail("separation re-ran on pre-separated stems"),
    )
    assert main(argv) == 0

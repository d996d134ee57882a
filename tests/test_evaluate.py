"""Objective-evaluation CLI tests."""
import json
import os

import numpy as np

from music_mixing_style_transfer_tpu.data.wavio import write_wav
from music_mixing_style_transfer_tpu.tools.evaluate import (
    evaluate_directory,
    evaluate_pair,
    main,
)


def _tone(sr, seconds, freq, gain, pan=0.5, seed=0):
    t = np.arange(int(sr * seconds)) / sr
    x = gain * np.sin(2 * np.pi * freq * t).astype(np.float32)
    x += 0.01 * np.random.default_rng(seed).standard_normal(len(t)).astype(np.float32)
    return np.stack([x * (1 - pan), x * pan], axis=1)


def test_identical_files_score_zero_ish(tmp_path):
    sr = 44100
    a = _tone(sr, 3.0, 220, 0.4, pan=0.4)
    pa = str(tmp_path / "a.wav")
    write_wav(pa, a, sr)
    scores = evaluate_pair(pa, pa, sr)
    assert scores, "no metrics returned"
    for k, v in scores.items():
        assert v is not None and np.isfinite(v), k
        assert abs(v) < 1e-3, (k, v)


def test_mismatched_styles_score_higher(tmp_path):
    sr = 44100
    ref = _tone(sr, 3.0, 220, 0.4, pan=0.45)
    close = _tone(sr, 3.0, 220, 0.38, pan=0.47, seed=1)
    far = _tone(sr, 3.0, 1760, 0.05, pan=0.95, seed=2)
    paths = {}
    for name, x in [("ref", ref), ("close", close), ("far", far)]:
        paths[name] = str(tmp_path / f"{name}.wav")
        write_wav(paths[name], x, sr)
    s_close = evaluate_pair(paths["close"], paths["ref"], sr)
    s_far = evaluate_pair(paths["far"], paths["ref"], sr)
    # the far render must be worse on the headline spectral + loudness axes
    assert s_far["centroid_mean"] > s_close["centroid_mean"]
    assert s_far["d_lufs"] > s_close["d_lufs"]


def test_numpy_loudness_matches_jax(rng):
    """integrated_loudness_np (host metrics path) vs the jitted BS.1770."""
    import jax.numpy as jnp
    from music_mixing_style_transfer_tpu.metrics import integrated_loudness_np
    from music_mixing_style_transfer_tpu.ops.loudness import integrated_loudness

    sr = 44100
    for seconds, gain in [(1.0, 0.3), (3.0, 0.05), (2.5, 0.8)]:
        x = (gain * rng.standard_normal((int(sr * seconds), 2))).astype(np.float32)
        a = integrated_loudness_np(x, sr)
        b = float(integrated_loudness(jnp.asarray(x), sr))
        assert abs(a - b) < 0.02, (seconds, gain, a, b)


def test_directory_mode_and_cli(tmp_path):
    sr = 44100
    for song in ("song1", "song2"):
        d = tmp_path / song
        d.mkdir()
        write_wav(str(d / "mixture_output.wav"), _tone(sr, 2.0, 330, 0.3, pan=0.4), sr)
        write_wav(str(d / "reference.wav"), _tone(sr, 2.0, 440, 0.25, pan=0.6, seed=3), sr)
    report = evaluate_directory(str(tmp_path))
    assert set(report) == {"song1", "song2", "mean"}

    out_json = str(tmp_path / "scores.json")
    rc = main(["--target_dir", str(tmp_path), "--json", out_json])
    assert rc == 0
    with open(out_json) as f:
        parsed = json.load(f)
    assert "mean" in parsed
    finite = [v for v in parsed["mean"].values() if v is not None]
    assert finite and np.isfinite(finite).all()

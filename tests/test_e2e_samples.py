"""End-to-end regression on the reference repo's shipped sample songs.

The reference demonstrates on real music under ``samples/`` with
pre-separated stems (reference README.md:24-95). Its style-transfer sample
ships only the input side and its interpolation sample only the reference
side, so the fixture composes one complete song directory from both: input
stems from ``samples/style_transfer/#0``, reference (and reference_B) stems
from ``samples/interpolation/#0`` — cropped to 2^17 samples (~3 s) to keep
the single-core CPU runtime tractable.

The full CLI path is exercised exactly as a user would run it
(``infer.style_transfer.main`` with normalization on and pre-separated
stems), with deterministic fast-init weights (no published checkpoints in
this environment), and the output waveform statistics are pinned as goldens.
"""
import os

import numpy as np
import pytest

from music_mixing_style_transfer_tpu.data.wavio import read_wav_stereo_ct, write_wav

SAMPLES = "/root/reference/samples"
CROP = 2**17  # ~2.97 s @ 44.1 kHz
INSTS = ("drums", "bass", "other", "vocals")

# pinned from the first verified run: full CLI, normalization on, fast-init
# seed-0 weights, CPU f32 (fixed inputs + seeds make the pipeline
# deterministic; 5% tolerance absorbs XLA reduction-order noise)
GOLDEN_RMS = 0.0587028

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not available"
)


@pytest.fixture(scope="module")
def sample_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_samples")
    song = root / "song0"
    src = {
        "input": f"{SAMPLES}/style_transfer/#0/separated/mdx_extra/input",
        "reference": f"{SAMPLES}/interpolation/#0/separated/mdx_extra/reference",
        "reference_B": f"{SAMPLES}/interpolation/#0/separated/mdx_extra/reference_B",
    }
    for name, d in src.items():
        out = song / "separated" / "mdx_extra" / name
        out.mkdir(parents=True)
        for inst in INSTS:
            x = read_wav_stereo_ct(os.path.join(d, inst + ".wav"))[:, :CROP]
            write_wav(str(out / (inst + ".wav")), x.T)
    return root


def _run_cli(sample_dir, extra):
    from music_mixing_style_transfer_tpu.infer.style_transfer import main

    argv = [
        "--target_dir", str(sample_dir) + "/",
        "--segment_length", "32768",
        "--segment_length_ref", "32768",
        # stems are pre-separated at separated/mdx_extra/<name>/ exactly like
        # the shipped samples; the CLI detects them and skips demucs
        "--do_not_separate", "false",
    ] + extra
    assert main(argv) == 0


def test_style_transfer_cli_on_reference_samples(sample_dir):
    _run_cli(sample_dir, [])
    out = sample_dir / "song0" / "mixture_output.wav"
    assert out.exists()
    y = read_wav_stereo_ct(str(out))
    assert y.shape == (2, CROP), "mixture must match the input length exactly"
    assert np.isfinite(y).all()
    assert float(np.abs(y).max()) > 1e-4, "output is silence"

    # golden regression values (deterministic: fixed fast-init seeds, fixed
    # input audio, fixed normalization features). Bounds are loose enough to
    # survive XLA-version reduction-order noise but pin gross behaviour.
    rms = float(np.sqrt(np.mean(y**2)))
    assert abs(rms - GOLDEN_RMS) < 0.05 * GOLDEN_RMS, f"mixture RMS drifted: {rms}"

    # run config dump written like the reference's save_args
    assert (sample_dir / "style_transfer_inference_configurations.txt").exists()


def test_feature_extraction_cli_on_reference_samples(sample_dir, tmp_path):
    """The feature-extraction CLI over real sample audio: one averaged
    2048-D embedding .npy per wav (reference feature_extraction.py:68-110)."""
    from music_mixing_style_transfer_tpu.infer.feature_extraction import main

    src = sample_dir / "song0" / "separated" / "mdx_extra" / "input" / "drums.wav"
    d = tmp_path / "fx"
    d.mkdir()
    (d / "drums.wav").write_bytes(src.read_bytes())
    assert main(["--target_dir", str(d), "--segment_length", "32768"]) == 0
    emb = np.load(d / "drums_fx_embedding.npy")
    assert emb.shape == (2048,)
    assert np.isfinite(emb).all()
    assert float(np.abs(emb).max()) > 0


def test_interpolation_cli_on_reference_samples(sample_dir):
    _run_cli(
        sample_dir,
        ["--interpolation", "true", "--interpolate_segments", "4"],
    )
    out = sample_dir / "song0" / "mixture_output_interpolation.wav"
    assert out.exists()
    y = read_wav_stereo_ct(str(out))
    assert y.shape == (2, CROP)
    assert np.isfinite(y).all()
    assert float(np.abs(y).max()) > 1e-4

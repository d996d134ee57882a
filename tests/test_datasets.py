"""Dataset tests: MUSDB-style sampling, manipulation, collate, caching."""
import os

import numpy as np
import pytest

import jax

from music_mixing_style_transfer_tpu.data import (
    ContrastivePairDataset,
    StyleTransferTripletDataset,
    load_ir_bank,
    trim_silence,
    write_wav,
)

SR = 44100
SEG = 2**13  # small for CPU tests
INSTS = ("drums", "vocals")


@pytest.fixture(scope="module")
def musdb_dir(tmp_path_factory):
    """Synthetic MUSDB-normalized layout: <dir>/<mode>/<inst>_normalized_..._silence_trimmed*.wav"""
    root = tmp_path_factory.mktemp("musdb")
    rng = np.random.default_rng(0)
    for mode in ("train", "val"):
        d = root / mode
        d.mkdir(exist_ok=True)
        for inst in INSTS:
            for part in range(2):
                T = SEG * (4 + part)
                x = (rng.standard_normal((T, 2)) * 0.2).astype(np.float32)
                write_wav(
                    str(d / f"{inst}_normalized_eqcompimagegain_silence_trimmed{part}.wav"),
                    x,
                    SR,
                )
    return str(root)


def _make_ds(musdb_dir, mode="train", **kw):
    return ContrastivePairDataset(
        musdb_dir,
        mode=mode,
        instruments=INSTS,
        segment_length=SEG,
        num_strong_negatives=1,
        **kw,
    )


def test_contrastive_batch_shapes(musdb_dir):
    ds = _make_ds(musdb_dir)
    a, b = ds.sample_batch([0, 1], epoch_seed=5)
    for inst in INSTS:
        assert a[inst].shape == (4, 2, SEG)  # 2 items x (1 neg + 1)
        assert b[inst].shape == (4, 2, SEG)
        assert np.isfinite(a[inst]).all()
        assert np.abs(a[inst]).max() <= 1.0


def test_contrastive_strong_negatives_differ(musdb_dir):
    """Views k of the same item share content but differ in FX."""
    ds = _make_ds(musdb_dir)
    a, _ = ds.sample_batch([0], epoch_seed=1)
    v0, v1 = a[INSTS[0]][0], a[INSTS[0]][1]
    assert not np.allclose(v0, v1)


def test_train_batches_vary_val_deterministic(musdb_dir):
    ds = _make_ds(musdb_dir)
    a1, _ = ds.sample_batch([0], epoch_seed=1)
    a2, _ = ds.sample_batch([0], epoch_seed=2)
    assert not np.allclose(a1[INSTS[0]], a2[INSTS[0]])

    dval = _make_ds(musdb_dir, mode="val")
    v1, _ = dval.sample_batch([3])
    v2, _ = dval.sample_batch([3])
    np.testing.assert_allclose(v1[INSTS[0]], v2[INSTS[0]])


def test_val_cache_roundtrip(musdb_dir, tmp_path):
    cache = str(tmp_path / "cache")
    dval = _make_ds(musdb_dir, mode="val", val_cache_dir=cache)
    v1, w1 = dval.sample_batch([2])
    assert os.path.isdir(os.path.join(cache, "2"))
    v2, w2 = dval.sample_batch([2])  # now loaded from cache
    np.testing.assert_allclose(v1[INSTS[0]], v2[INSTS[0]], atol=1.0 / 2**14)


def test_collate_random_duration(musdb_dir):
    ds = _make_ds(musdb_dir)
    a, b = ds.sample_batch([0, 1], epoch_seed=0)
    rng = np.random.default_rng(0)
    ca, cb = ds.collate_random_duration(a, b, rng)
    assert ca.shape[0] == len(INSTS) and ca.shape[1] == 4 and ca.shape[2] == 2
    assert SEG // 2 <= ca.shape[3] <= SEG
    assert ca.shape[3] % 4096 == 0


def test_style_transfer_triplets(musdb_dir):
    ds = StyleTransferTripletDataset(
        musdb_dir, mode="train", instruments=INSTS, segment_length=SEG
    )
    batch = ds.sample_batch([0, 1], epoch_seed=3)
    for inst in INSTS:
        for k in ("a1", "a2", "b2"):
            assert batch[inst][k].shape == (2, 2, SEG)
        # a1 is the raw segment; a2 is its manipulated version (same content)
        assert not np.allclose(batch[inst]["a1"], batch[inst]["a2"])
    assert len(ds) > 0


def test_generate_contents_w_effects(musdb_dir, tmp_path):
    ds = _make_ds(musdb_dir)
    out = str(tmp_path / "gen")
    ds.generate_contents_w_effects(num_content=2, num_effects=2, out_dir=out)
    files = os.listdir(out)
    assert any(f.startswith("mixture_") for f in files)
    assert any(f.endswith("_ori_0.wav") for f in files)


def test_ir_bank_loader(tmp_path):
    rng = np.random.default_rng(0)
    for rt, n in [("500-1000", 2), ("3000-4000", 1)]:
        d = tmp_path / "irs" / "roomA" / "RT60_avg" / rt
        d.mkdir(parents=True)
        for i in range(n):
            ir = (rng.standard_normal((2000 + 100 * i, 2)) * 0.1).astype(np.float32)
            write_wav(str(d / f"ir{i}.wav"), ir, SR)
    bank, bounds = load_ir_bank(str(tmp_path / "irs"))
    assert bank.shape[0] == 3
    assert bank.shape[1] == 2
    assert list(bounds) == [0, 2, 3]


def test_trim_silence():
    x = np.zeros((2, 4096 * 4), np.float32)
    x[:, 4096 : 2 * 4096] = 0.5
    y = trim_silence(x, threshold_db=-40)
    assert y.shape[1] == 4096


def test_prepare_musdb_feeds_training_datasets(tmp_path, rng):
    """prepare_musdb output must satisfy the dataset file contract
    end-to-end: raw MUSDB layout -> prepped corpus -> ContrastivePairDataset."""
    from music_mixing_style_transfer_tpu.tools.prepare_musdb import prepare_corpus
    from music_mixing_style_transfer_tpu.data.datasets import ContrastivePairDataset
    from music_mixing_style_transfer_tpu.data.wavio import write_wav

    root = tmp_path / "musdb"
    for s, song in [("train", "songA"), ("train", "songB")]:
        d = root / s / song
        os.makedirs(d)
        for inst in ("drums", "bass", "other", "vocals"):
            t = int(rng.integers(60000, 90000))
            x = (rng.standard_normal((t, 2)) * 0.2).clip(-1, 1).astype(np.float32)
            x[: 12000] *= 1e-5  # leading silence to exercise the trim
            write_wav(str(d / f"{inst}.wav"), x)

    out = tmp_path / "prepped"
    # --no_normalize path: fast (no device normalization) and exercises the
    # same file-contract; the normalized path shares the writer code
    n = prepare_corpus(str(root), str(out), splits=("train",), normalize=False)
    assert n == 2
    files = sorted(os.listdir(out / "train"))
    assert "drums_silence_trimmed0.wav" in files and "vocals_silence_trimmed1.wav" in files

    ds = ContrastivePairDataset(
        str(out), mode="train", segment_length=8192, use_normalized=False
    )
    a, b = ds.sample_batch([0], epoch_seed=1)
    assert a["drums"].shape == (2, 2, 8192)
    assert all(np.isfinite(v).all() for v in a.values())

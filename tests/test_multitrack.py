"""Aligned-multitrack data layer vs the reference semantics
(``common_dataprocessing.py:205-534``)."""
import numpy as np
import pytest

from music_mixing_style_transfer_tpu.data.multitrack import (
    mixing_minibatch,
    mixture_minibatch,
    scan_mixing_dataset,
)
from music_mixing_style_transfer_tpu.data.wavio import write_wav


@pytest.fixture()
def corpus(tmp_path):
    """3 songs; song2 is missing vocals; song3 holds an unknown source and a
    mono stem; plus one empty directory that must be pruned."""
    rng = np.random.default_rng(0)
    T = 8000
    truth = {}
    for song, srcs in (
        ("song1", ["mixture", "vocals"]),
        ("song2", ["mixture"]),
        ("song3", ["mixture", "vocals", "cowbell"]),
    ):
        d = tmp_path / song
        d.mkdir()
        for s in srcs:
            ch = 1 if (song == "song3" and s == "vocals") else 2
            x = (rng.standard_normal((ch, T)) * 0.1).astype(np.float32)
            write_wav(str(d / f"{s}.wav"), x.T)
            truth[(song, s)] = x
    (tmp_path / "empty").mkdir()
    return tmp_path, truth, T


def test_scan_semantics(corpus):
    path, truth, T = corpus
    ds = scan_mixing_dataset(str(path), sources=("mixture", "vocals"))
    # empty dir pruned, unknown source skipped
    assert ds.directories == ["song1", "song2", "song3"]
    assert set(ds.songs[0]) == {"mixture", "vocals"}
    assert set(ds.songs[1]) == {"mixture"}
    assert set(ds.songs[2]) == {"mixture", "vocals"}
    # mono -> stereo repeat
    v3 = ds.songs[2]["vocals"].load()
    assert v3.shape[0] == 2
    np.testing.assert_array_equal(v3[0], v3[1])
    # material stats accumulate across songs
    assert ds.material_seconds["mixture"] == pytest.approx(3 * T / 44100, rel=1e-6)


def test_scan_source_mapping_and_rate_validation(corpus):
    path, _, _ = corpus
    ds = scan_mixing_dataset(
        str(path), sources=("mix",), mapped_sources={"mixture": "mix"}
    )
    assert all("mix" in s for s in ds.songs)
    with pytest.raises(ValueError, match="fs="):
        scan_mixing_dataset(
            str(path), sources=("mixture",), accepted_sampling_rates=(48000,)
        )


def test_sample_aligned_shares_window(corpus):
    """The same random window must be cut from every stem (generate_data's
    shared idx_start) — verified by re-finding each chunk at the same offset."""
    path, truth, T = corpus
    ds = scan_mixing_dataset(str(path), sources=("mixture", "vocals"))
    n = 500
    win = ds.sample_aligned(0, n, rng=np.random.default_rng(3))
    mix_full = ds.songs[0]["mixture"].load()
    voc_full = ds.songs[0]["vocals"].load()
    # locate the window start in the mixture, check vocals used the same one
    for start in range(T):
        seg = (
            mix_full[:, start : start + n]
            if start + n <= T
            else np.concatenate([mix_full[:, start:], mix_full[:, : n - (T - start)]], 1)
        )
        if seg.shape == win["mixture"].shape and np.array_equal(seg, win["mixture"]):
            ref = (
                voc_full[:, start : start + n]
                if start + n <= T
                else np.concatenate([voc_full[:, start:], voc_full[:, : n - (T - start)]], 1)
            )
            np.testing.assert_array_equal(win["vocals"], ref)
            return
    pytest.fail("window not found in source audio")


def test_sample_aligned_pads_short_stems(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "s"
    d.mkdir()
    write_wav(str(d / "long.wav"), (rng.standard_normal((4000, 2)) * 0.1).astype(np.float32))
    write_wav(str(d / "short.wav"), (rng.standard_normal((1000, 2)) * 0.1).astype(np.float32))
    ds = scan_mixing_dataset(str(tmp_path), sources=("long", "short"))
    win = ds.sample_aligned(0, 2000, rng=rng)
    assert win["long"].shape == win["short"].shape == (2, 2000)


def test_mixing_minibatch_augments_inputs_only(corpus):
    path, _, _ = corpus
    ds = scan_mixing_dataset(str(path), sources=("mixture", "vocals"))
    pad = (16, 16)
    calls = []

    def augmenter(x):
        calls.append(x.shape)
        return x * 2.0

    stems, mixes = mixing_minibatch(
        ds,
        inputs=["vocals"],
        outputs=["mixture"],
        batch_size=3,
        n_samples=512,
        augmenter=augmenter,
        augmenter_sources=["vocals"],
        augmenter_padding=pad,
        idx_songs=[0, 0, 2],
        rng=np.random.default_rng(5),
    )
    assert stems["vocals"].shape == mixes["mixture"].shape == (3, 2, 512)
    # augmenter saw the padded window, and ONLY for the input source
    assert calls and all(s == (2, 512 + sum(pad)) for s in calls)
    assert len(calls) == 3
    # outputs untouched: mixture values must exist in the raw song audio
    assert np.isfinite(mixes["mixture"]).all()


def test_mixture_minibatch_presence_overlap_and_normalization(corpus):
    path, _, _ = corpus
    ds = scan_mixing_dataset(str(path), sources=("mixture", "vocals"))
    rng = np.random.default_rng(7)
    inp, tar = mixture_minibatch(
        ds,
        sources=["mixture", "vocals"],
        batch_size=4,
        n_samples=256,
        present_prob={"vocals": 0.0},  # vocals always absent
        overlap_prob={"mixture": 1.0},  # mixture always overlapped
        rng=rng,
    )
    assert inp.shape == (4, 2, 256)
    assert float(np.abs(tar["vocals"]).max()) == 0.0
    # mixture == sum of targets after joint normalization
    np.testing.assert_allclose(inp, tar["mixture"] + tar["vocals"], atol=1e-6)
    assert float(np.abs(inp).max()) <= 1.0 + 1e-6

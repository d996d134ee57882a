"""Fused-augmentation training path: exactness vs the legacy data path.

The fused path (train/fused.py + the raw producers in data/datasets.py)
moves FX manipulation inside the training dispatch chain; these tests pin
that it reproduces the legacy ``sample_batch`` + ``collate_random_duration``
+ train-step route bit-for-bit in content (same keys, same crop plan) and
to float tolerance in arithmetic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
from music_mixing_style_transfer_tpu.data import write_wav
from music_mixing_style_transfer_tpu.data.datasets import (
    ContrastivePairDataset,
    StyleTransferTripletDataset,
    host_split_keys,
    to_transport,
)
from music_mixing_style_transfer_tpu.models import FXencoder
from music_mixing_style_transfer_tpu.parallel import create_mesh
from music_mixing_style_transfer_tpu.train import (
    FusedContrastivePipeline,
    create_train_state,
    init_contrastive,
    init_converter,
    make_contrastive_train_step,
    make_converter_train_step,
    make_fused_converter_step,
    make_sharded_fused_converter_step,
)
from music_mixing_style_transfer_tpu.train.fused import (
    augment_contrastive_views,
    augment_triplets,
    crop_views,
)

SR = 44100
SEG = 2**13
INSTS = ("drums", "vocals")
SMALL_ENC = FXencoderConfig(
    channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
)
SMALL_TCN = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=7)


@pytest.fixture(scope="module")
def musdb_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("musdb_fused")
    rng = np.random.default_rng(7)
    d = root / "train"
    d.mkdir()
    for inst in INSTS:
        for part in range(2):
            T = SEG * (4 + part)
            # int16-quantized content so the int16 transport is lossless
            x = np.round(rng.standard_normal((T, 2)) * 0.2 * 32768)
            x = np.clip(x, -32768, 32767).astype(np.float32) / 32768.0
            write_wav(
                str(d / f"{inst}_normalized_eqcompimagegain_silence_trimmed{part}.wav"),
                x.astype(np.float32),
                SR,
            )
    return str(root)


def test_host_split_keys_matches_prngkey():
    for seed in (0, 1, 777, 10_000_003, 2**40 + 5):
        want = np.asarray(jax.random.split(jax.random.PRNGKey(seed), 6))
        got = host_split_keys([seed], 6)[0]
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="non-negative"):
        host_split_keys([-3], 6)


def test_to_transport_auto():
    exact = np.array([[0.0, 1 / 32768.0, -0.5]], np.float32)
    q = to_transport(exact, "auto")
    assert q.dtype == np.int16
    np.testing.assert_array_equal(q.astype(np.float32) / 32768.0, exact)
    inexact = np.array([[0.3, 0.1]], np.float32)
    assert to_transport(inexact, "auto").dtype == np.float32


def _contrastive_ds(musdb_dir, **kw):
    return ContrastivePairDataset(
        musdb_dir, mode="train", instruments=INSTS, segment_length=SEG,
        num_strong_negatives=1, **kw,
    )


def test_raw_batch_matches_legacy_views(musdb_dir):
    """sample_raw_batch + on-device augment + crop == sample_batch + collate."""
    ds = _contrastive_ds(musdb_dir)
    idxs, seed = [0, 1], 42

    a_legacy, b_legacy = ds.sample_batch(idxs, epoch_seed=seed)
    rng1 = np.random.default_rng(9)
    ca, cb = ds.collate_random_duration(a_legacy, b_legacy, rng1)

    segs, keys = ds.sample_raw_batch(idxs, epoch_seed=seed)
    assert segs.dtype == np.int16  # 16-bit sources quantize losslessly
    rng2 = np.random.default_rng(9)
    la, lb, sa, sb = ds.collate_plan(ca.shape[1], rng2)
    assert (la, lb) == (ca.shape[-1], cb.shape[-1])

    a_full, b_full = jax.jit(
        lambda s, k: augment_contrastive_views(
            ds.manipulators, ds.instruments, s, k, ds.pad
        )
    )(segs, keys)
    fa = np.asarray(crop_views(a_full, jnp.asarray(sa), la))
    fb = np.asarray(crop_views(b_full, jnp.asarray(sb), lb))

    # batched-vs-per-item FFT/conv reassociation: same math to float noise
    np.testing.assert_allclose(fa, ca, atol=1e-4)
    np.testing.assert_allclose(fb, cb, atol=1e-4)


def test_fused_pipeline_matches_legacy_step(musdb_dir):
    """One FusedContrastivePipeline step == legacy step on the legacy batch."""
    ds = _contrastive_ds(musdb_dir)
    idxs, seed = [0, 1], 5

    enc, state, _ = init_contrastive(SMALL_ENC, example_length=SEG)
    tx = optax.sgd(0.05)
    state = create_train_state(state.variables(), tx)

    a_legacy, b_legacy = ds.sample_batch(idxs, epoch_seed=seed)
    ca, cb = ds.collate_random_duration(a_legacy, b_legacy, np.random.default_rng(3))
    legacy = jax.jit(make_contrastive_train_step(enc, tx, 0.1))
    s1, loss1 = legacy(state, jnp.asarray(ca), jnp.asarray(cb))

    pipe = FusedContrastivePipeline(enc, tx, 0.1)
    pipe.set_chains(ds.manipulators, ds.instruments, ds.pad)
    segs, keys = ds.sample_raw_batch(idxs, epoch_seed=seed)
    la, lb, sa, sb = ds.collate_plan(ca.shape[1], np.random.default_rng(3))
    s2, loss2 = pipe.step(state, segs, keys, sa, sb, la, lb)

    assert abs(float(loss1) - float(loss2)) < 1e-4 * max(1.0, abs(float(loss1)))
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # input-side float noise (batched-vs-per-item FFT) through one grad
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)
    # second step with a different shape bucket exercises the step cache
    # (full-length crop: the only other bucket at this tiny SEG)
    s3, loss3 = pipe.step(s2, segs, keys, np.zeros_like(sa), sb, SEG, lb)
    assert np.isfinite(float(loss3))
    assert len(pipe._steps) == 2


def test_fused_pipeline_sharded_matches_single(musdb_dir):
    """Mesh pipeline == single-device pipeline (augment shards over items,
    NT-Xent negatives all_gather inside the step)."""
    ds = ContrastivePairDataset(
        musdb_dir, mode="train", instruments=INSTS, segment_length=SEG,
        num_strong_negatives=0,
    )
    idxs, seed = list(range(8)), 11
    cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1),
        norm="none",  # per-shard BN stats differ by design; see test_train.py
    )
    enc, state, _ = init_contrastive(cfg, example_length=SEG, seed=3)
    tx = optax.sgd(0.05)
    state = create_train_state(state.variables(), tx)

    segs, keys = ds.sample_raw_batch(idxs, epoch_seed=seed)
    la, lb, sa, sb = ds.collate_plan(len(idxs), np.random.default_rng(1))

    single = FusedContrastivePipeline(enc, tx, 0.1)
    single.set_chains(ds.manipulators, ds.instruments, ds.pad)
    s1, loss1 = single.step(state, segs, keys, sa, sb, la, lb)

    mesh = create_mesh(8)
    piped = FusedContrastivePipeline(enc, tx, 0.1, mesh=mesh)
    piped.set_chains(ds.manipulators, ds.instruments, ds.pad)
    s2, loss2 = piped.step(state, segs, keys, sa, sb, la, lb)

    assert abs(float(loss1) - float(loss2)) < 1e-5 * max(1.0, abs(float(loss1)))
    grads1, grads2 = [], []
    for p0, p1, p2 in zip(
        jax.tree.leaves(state.params),
        jax.tree.leaves(s1.params),
        jax.tree.leaves(s2.params),
    ):
        grads1.append((np.asarray(p0) - np.asarray(p1)) / 0.05)
        grads2.append((np.asarray(p0) - np.asarray(p2)) / 0.05)
    # sharding totally reorders the f32 sum reductions behind gradients
    # (per-shard partials + pmean vs one long sum), and cancellation in the
    # batch/time sums puts an ABSOLUTE noise floor on every element that is
    # set by the largest gradients in the step, not by each leaf's own
    # magnitude — so tolerate atol vs the global scale plus rtol vs the
    # leaf scale (observed noise: up to ~1.2e-3 x global on single
    # elements while siblings agree to 1e-6; the loss agrees to 1e-5)
    gscale = max(max(float(np.max(np.abs(g))) for g in grads1), 1e-3)
    for g1, g2 in zip(grads1, grads2):
        lscale = float(np.max(np.abs(g1)))
        assert float(np.max(np.abs(g1 - g2))) < 2e-3 * gscale + 2.5e-3 * lscale
        # the absolute term above frees SMALL leaves from any meaningful
        # elementwise bound; per-leaf norm agreement keeps a zeroed or
        # corrupted small leaf from slipping under the global noise floor
        n1, n2 = float(np.linalg.norm(g1)), float(np.linalg.norm(g2))
        assert abs(n1 - n2) < 1e-2 * n1 + 1e-4, (n1, n2)


def test_fused_pipeline_mesh_divisibility(musdb_dir):
    ds = _contrastive_ds(musdb_dir)
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=SEG)
    pipe = FusedContrastivePipeline(enc, tx, 0.1, mesh=create_mesh(8))
    pipe.set_chains(ds.manipulators, ds.instruments, ds.pad)
    segs, keys = ds.sample_raw_batch([0, 1], epoch_seed=0)  # 2 items: not /8
    la, lb, sa, sb = ds.collate_plan(4, np.random.default_rng(0))
    with pytest.raises(ValueError, match="mesh size"):
        pipe.step(state, segs, keys, sa, sb, la, lb)


def test_fused_converter_matches_legacy(musdb_dir):
    ds = StyleTransferTripletDataset(
        musdb_dir, mode="train", instruments=INSTS, segment_length=SEG
    )
    idxs, seed = [0, 1], 21

    enc_model = FXencoder(config=SMALL_ENC)
    enc_vars = enc_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, SEG)))
    conv, state, _ = init_converter(SMALL_TCN, example_length=SEG)
    tx = optax.sgd(0.05)
    state = create_train_state(state.variables(), tx)

    batch = ds.sample_batch(idxs, epoch_seed=seed)
    a1 = np.concatenate([batch[i]["a1"] for i in ds.instruments])
    a2 = np.concatenate([batch[i]["a2"] for i in ds.instruments])
    b2 = np.concatenate([batch[i]["b2"] for i in ds.instruments])
    legacy = jax.jit(make_converter_train_step(conv, enc_model, tx))
    s1, loss1 = legacy(state, enc_vars, jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b2))

    segs, keys = ds.sample_raw_batch(idxs, epoch_seed=seed)
    # raw triplet views match the legacy batch exactly
    fa1, fa2, fb2 = jax.jit(
        lambda s, k: augment_triplets(
            ds.manipulators, ds.instruments, s, k, ds.pad, SEG
        )
    )(segs, keys)
    np.testing.assert_allclose(np.asarray(fa1), a1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fa2), a2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fb2), b2, atol=1e-4)

    fused = jax.jit(make_fused_converter_step(
        conv, enc_model, tx, ds.manipulators, ds.instruments, ds.pad, SEG
    ))
    s2, loss2 = fused(state, enc_vars, jnp.asarray(segs), jnp.asarray(keys))
    assert abs(float(loss1) - float(loss2)) < 1e-4 * max(1.0, abs(float(loss1)))

    mesh = create_mesh(4)
    sharded = make_sharded_fused_converter_step(
        conv, enc_model, tx, ds.manipulators, ds.instruments, ds.pad, SEG,
        mesh,
    )
    segs4, keys4 = ds.sample_raw_batch(list(range(4)), epoch_seed=seed)
    s3, loss3 = sharded(state, enc_vars, jnp.asarray(segs4), jnp.asarray(keys4))
    assert np.isfinite(float(loss3))


def test_fused_pipeline_dynamic_probs_match_rebuilt_chains(musdb_dir):
    """pipeline.step(probs=scheduled) == a pipeline whose chains were REBUILT
    at those probabilities — the loop's probability scheduling reuses one
    executable instead of re-jitting the augmentation each epoch."""
    sched = {"eq": 0.5, "comp": 0.5, "pan": 0.3, "imager": 0.8, "gain": 0.5}
    ds_base = _contrastive_ds(musdb_dir)
    ds_sched = _contrastive_ds(musdb_dir, apply_prob_dict=sched)
    idxs, seed = [0, 1], 13

    enc, state, _ = init_contrastive(SMALL_ENC, example_length=SEG)
    tx = optax.sgd(0.05)
    state = create_train_state(state.variables(), tx)

    segs, keys = ds_base.sample_raw_batch(idxs, epoch_seed=seed)
    la, lb, sa, sb = ds_base.collate_plan(4, np.random.default_rng(2))

    dyn = FusedContrastivePipeline(enc, tx, 0.1)
    dyn.set_chains(ds_base.manipulators, ds_base.instruments, ds_base.pad)
    s1, loss1 = dyn.step(state, segs, keys, sa, sb, la, lb, probs=sched)

    baked = FusedContrastivePipeline(enc, tx, 0.1)
    baked.set_chains(ds_sched.manipulators, ds_sched.instruments, ds_sched.pad)
    s2, loss2 = baked.step(state, segs, keys, sa, sb, la, lb)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)

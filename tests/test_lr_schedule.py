"""LR schedules + mid-schedule checkpoint resume.

The reference's checkpoints carry optimizer AND scheduler state
(``modules/training_utils.py:13-29,33-96`` saves/reloads
``scheduler.state_dict()``). Here the schedule is a pure function of the
optax step counter inside ``opt_state``, so an orbax restore must reproduce
the unbroken run's LR sequence — asserted parameter-exactly below.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TrainConfig
from music_mixing_style_transfer_tpu.train import init_contrastive
from music_mixing_style_transfer_tpu.train.checkpoint import CheckpointManager
from music_mixing_style_transfer_tpu.train.contrastive import (
    make_contrastive_train_step,
)
from music_mixing_style_transfer_tpu.train.state import (
    current_lr,
    make_lr_schedule,
)

SMALL = FXencoderConfig(
    channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
)


def test_warmup_cosine_shape():
    tcfg = TrainConfig(
        learning_rate=1e-3,
        lr_schedule="warmup_cosine",
        lr_warmup_steps=10,
        lr_decay_steps=100,
        lr_end_factor=0.1,
    )
    s = make_lr_schedule(tcfg)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)  # peak at warmup end
    assert float(s(5)) == pytest.approx(5e-4, rel=1e-6)  # linear warmup
    assert float(s(55)) < 1e-3  # decaying
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-6)  # end_value
    assert float(s(1000)) == pytest.approx(1e-4, rel=1e-6)  # clamped after


def test_step_decay_shape():
    tcfg = TrainConfig(
        learning_rate=2e-4, lr_schedule="step", lr_step_size=100, lr_gamma=0.5
    )
    s = make_lr_schedule(tcfg)
    assert float(s(0)) == pytest.approx(2e-4)
    assert float(s(99)) == pytest.approx(2e-4)  # staircase: flat within bin
    assert float(s(100)) == pytest.approx(1e-4)
    assert float(s(250)) == pytest.approx(5e-5)  # two decays: 2e-4 * 0.5^2


def test_constant_with_warmup():
    tcfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=4)
    s = make_lr_schedule(tcfg)
    assert float(s(0)) == 0.0
    assert float(s(2)) == pytest.approx(5e-4)
    assert float(s(4)) == pytest.approx(1e-3)
    assert float(s(400)) == pytest.approx(1e-3)
    assert current_lr(tcfg, 2) == pytest.approx(5e-4)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_lr_schedule(TrainConfig(lr_schedule="nope"))


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    T = 2**12
    for _ in range(n):
        a = rng.standard_normal((2, 2, 2, T)).astype(np.float32) * 0.1
        b = rng.standard_normal((2, 2, 2, T)).astype(np.float32) * 0.1
        yield jnp.asarray(a), jnp.asarray(b)


def test_resume_mid_schedule_matches_unbroken_run(tmp_path):
    """Checkpoint at step 3 of a steep 6-step schedule, restore, run steps
    4-6: parameters must match the unbroken 6-step run exactly (any drift in
    the restored schedule counter would change the LR and the params)."""
    tcfg = TrainConfig(
        learning_rate=1e-2,
        lr_schedule="warmup_cosine",
        lr_warmup_steps=2,
        lr_decay_steps=6,
        lr_end_factor=0.0,
        segment_length=2**12,
    )

    def run(n_steps, state=None, seed_ofs=0):
        enc, st, tx = init_contrastive(SMALL, tcfg, example_length=2**12)
        step = jax.jit(make_contrastive_train_step(enc, tx, tcfg.temperature))
        if state is not None:
            st = state
        for i, (a, b) in enumerate(_batches(n_steps, seed=seed_ofs)):
            st, _ = step(st, a, b)
        return st

    # unbroken: 3 steps on stream A then 3 on stream B
    st_full = run(3, seed_ofs=0)
    st_full = run(3, state=st_full, seed_ofs=1)

    # broken: 3 steps, orbax round-trip, 3 more
    st_half = run(3, seed_ofs=0)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    mgr.save(3, st_half)
    _, template, _ = init_contrastive(SMALL, tcfg, example_length=2**12)
    st_restored = mgr.restore(template)
    st_resumed = run(3, state=st_restored, seed_ofs=1)

    for a, b in zip(jax.tree.leaves(st_full.params), jax.tree.leaves(st_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_schedule_actually_changes_updates():
    """Two optimizers, constant vs steep cosine, same grads -> different
    param trajectories (the schedule is really wired into the optimizer)."""
    tcfg_c = TrainConfig(learning_rate=1e-2, segment_length=2**12)
    tcfg_s = TrainConfig(
        learning_rate=1e-2,
        lr_schedule="warmup_cosine",
        lr_warmup_steps=1,
        lr_decay_steps=4,
        segment_length=2**12,
    )

    outs = []
    for tcfg in (tcfg_c, tcfg_s):
        enc, st, tx = init_contrastive(SMALL, tcfg, example_length=2**12)
        step = jax.jit(make_contrastive_train_step(enc, tx, tcfg.temperature))
        for a, b in _batches(2):
            st, _ = step(st, a, b)
        outs.append(st)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(outs[0].params), jax.tree.leaves(outs[1].params))
    ]
    assert max(diffs) > 1e-6

"""Training-step tests: contrastive + converter, single-device and sharded."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig, TrainConfig
from music_mixing_style_transfer_tpu.models import FXencoder, MixFXcloner
from music_mixing_style_transfer_tpu.parallel import create_mesh
from music_mixing_style_transfer_tpu.train import (
    CheckpointManager,
    create_train_state,
    init_contrastive,
    init_converter,
    make_contrastive_train_step,
    make_converter_train_step,
    make_optimizer,
    make_sharded_contrastive_step,
    make_sharded_converter_step,
)

SMALL_ENC = FXencoderConfig(
    channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
)
SMALL_TCN = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=7)
T = 4096


def test_contrastive_step_decreases_loss(rng):
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    step = make_contrastive_train_step(enc, tx, temperature=0.1)
    step = jax.jit(step)
    a = jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.2)
    b = a + 0.01 * jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32))
    losses = []
    for _ in range(4):
        state, loss = step(state, a, b)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_contrastive_step_unequal_view_durations(rng):
    """The reference collate draws input_length_a and input_length_b
    independently (data_loader.py:51) — the step must accept A/B views of
    different lengths (regression: the concat formulation crashed on the
    first real collate batch with La != Lb)."""
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    step = jax.jit(make_contrastive_train_step(enc, tx, temperature=0.1))
    a = jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.2)
    b = jnp.asarray(
        rng.standard_normal((2, 4, 2, T // 2)).astype(np.float32) * 0.2
    )
    state, loss = step(state, a, b)
    assert np.isfinite(float(loss)) and int(state.step) == 1


def test_contrastive_sharded_matches_single(rng):
    """Sharded step over a 4-device mesh == single-device step on the global
    batch (the all_gather reproduces full-batch negatives; psum reconstructs
    the exact global gradient). BatchNorm is disabled for exactness — with BN
    the sharded step uses per-shard statistics like the reference's
    per-replica BN (SyncBatchNorm commented out, network_utils.py:75-76).

    Uses plain SGD so the one-step param delta IS ``-lr * grad``: the
    comparison is grad-level and immune to Adam's rsqrt amplification of
    f32 reduction-order noise (the previous absolute post-Adam bound flaked)."""
    import optax

    cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1), norm="none"
    )
    enc, state0, _ = init_contrastive(cfg, example_length=T, seed=3)
    lr = 0.05
    tx = optax.sgd(lr)
    state = create_train_state(state0.variables(), tx)
    a = jnp.asarray(rng.standard_normal((1, 8, 2, T)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((1, 8, 2, T)).astype(np.float32) * 0.2)

    single = jax.jit(make_contrastive_train_step(enc, tx, 0.1))
    s1, loss1 = single(state, a, b)

    mesh = create_mesh(4)
    sharded = make_sharded_contrastive_step(enc, tx, mesh, 0.1)
    s2, loss2 = sharded(state, a, b)

    assert abs(float(loss1) - float(loss2)) < 1e-5 * max(1.0, abs(float(loss1)))
    # effective gradients (param deltas / lr) agree to relative precision
    for p0, p1, p2 in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        g1 = (np.asarray(p0) - np.asarray(p1)) / lr
        g2 = (np.asarray(p0) - np.asarray(p2)) / lr
        scale = max(float(np.max(np.abs(g1))), 1e-3)
        assert float(np.max(np.abs(g1 - g2))) < 1e-3 * scale


def test_converter_step_runs(rng):
    enc_model = FXencoder(config=SMALL_ENC)
    enc_vars = enc_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, T)))
    conv, state, tx = init_converter(SMALL_TCN, example_length=T)
    step = jax.jit(make_converter_train_step(conv, enc_model, tx))
    a1 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    losses = []
    for _ in range(3):
        state, loss = step(state, enc_vars, a1, a2, b2)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_converter_sharded_runs(rng):
    enc_model = FXencoder(config=SMALL_ENC)
    enc_vars = enc_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, T)))
    conv, state, tx = init_converter(SMALL_TCN, example_length=T)
    mesh = create_mesh(4)
    step = make_sharded_converter_step(conv, enc_model, tx, mesh)
    a1 = jnp.asarray(rng.standard_normal((4, 2, T)).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.standard_normal((4, 2, T)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((4, 2, T)).astype(np.float32) * 0.2)
    state, loss = step(state, enc_vars, a1, a2, b2)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path, rng):
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(1, state)
    state2 = jax.tree.map(lambda x: x * 0, state)
    mgr.save(2, state2)
    assert mgr.latest_step() == 2
    restored = mgr.restore(state)
    leaf0 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(leaf0), 0.0)
    restored1 = mgr.restore(state, step=1)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored1.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_checkpoint_retention(tmp_path):
    """keep=2 prunes older checkpoints (reference remove_ckpt semantics)."""
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    for step in [1, 2, 3]:
        mgr.save(step, state)
    assert mgr.latest_step() == 3
    with pytest.raises(Exception):
        mgr.restore(state, step=1)  # pruned
    restored = mgr.restore(state, step=2)
    assert restored is not None


def test_mixed_precision_steps_keep_f32_state(rng):
    """compute_dtype=bfloat16: model fwd/bwd in bf16; params, batch stats,
    optimizer state, and loss stay float32; loss close to the f32 step's."""
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    a = jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.2)
    b = a + 0.01 * jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32))
    step32 = jax.jit(make_contrastive_train_step(enc, tx, 0.1))
    step16 = jax.jit(make_contrastive_train_step(enc, tx, 0.1, compute_dtype="bfloat16"))
    _, l32 = step32(state, a, b)
    s16, l16 = step16(state, a, b)
    assert l16.dtype == jnp.float32
    assert abs(float(l32) - float(l16)) < 0.05 * max(abs(float(l32)), 1.0)
    for leaf in jax.tree.leaves(s16.params) + jax.tree.leaves(s16.batch_stats):
        assert leaf.dtype == jnp.float32

    enc_model = FXencoder(config=SMALL_ENC)
    enc_vars = enc_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, T)))
    conv, cstate, ctx = init_converter(SMALL_TCN, example_length=T)
    cstep = jax.jit(
        make_converter_train_step(conv, enc_model, ctx, compute_dtype="bfloat16")
    )
    a1 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((2, 2, T)).astype(np.float32) * 0.2)
    cstate, closs = cstep(cstate, enc_vars, a1, a2, b2)
    assert closs.dtype == jnp.float32 and np.isfinite(float(closs))
    for leaf in jax.tree.leaves(cstate.params) + jax.tree.leaves(cstate.batch_stats):
        assert leaf.dtype == jnp.float32


def test_sharded_mixed_precision_matches_single_device(rng):
    """bf16 sharded step == bf16 single-device step on the same global batch."""
    enc, state, tx = init_contrastive(SMALL_ENC, example_length=T)
    a = jnp.asarray(rng.standard_normal((2, 8, 2, T)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((2, 8, 2, T)).astype(np.float32) * 0.2)
    mesh = create_mesh(4)
    sh = make_sharded_contrastive_step(enc, tx, mesh, 0.1, compute_dtype="bfloat16")
    single = jax.jit(make_contrastive_train_step(enc, tx, 0.1, compute_dtype="bfloat16"))
    s_sh, l_sh = sh(state, a, b)
    s_si, l_si = single(state, a, b)
    assert abs(float(l_sh) - float(l_si)) < 2e-2


def test_remat_training_step_matches(tiny_cfgs=None):
    """remat=True must change memory use only — identical loss and params."""
    import jax
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.config import FXencoderConfig, TrainConfig
    from music_mixing_style_transfer_tpu.train import (
        init_contrastive,
        make_contrastive_train_step,
    )

    cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
    )
    rng = np.random.default_rng(0)
    T = 4096
    a = jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.1)

    results = []
    for remat in (False, True):
        tcfg = TrainConfig(remat=remat)
        enc, state, tx = init_contrastive(config=cfg, train_cfg=tcfg, seed=3)
        step = jax.jit(make_contrastive_train_step(enc, tx))
        state, loss = step(state, a, b)
        results.append((float(loss), state.params))

    assert np.isfinite(results[0][0])
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    for (p0, p1) in zip(
        jax.tree.leaves(results[0][1]), jax.tree.leaves(results[1][1])
    ):
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-6)


def test_fsdp_sharded_matches_single(rng):
    """FSDP step (params + Adam moments sharded over the mesh, all-gathered
    at use, reduce-scattered grads) == single-device step. Same grad-level
    SGD comparison as test_contrastive_sharded_matches_single; min_size=1
    so the tiny test model's conv kernels actually shard."""
    import optax

    from music_mixing_style_transfer_tpu.train import (
        make_fsdp_contrastive_step,
        shard_train_state,
    )

    cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1), norm="none"
    )
    enc, state0, _ = init_contrastive(cfg, example_length=T, seed=3)
    lr = 0.05
    tx = optax.sgd(lr)
    state = create_train_state(state0.variables(), tx)
    a = jnp.asarray(rng.standard_normal((1, 8, 2, T)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((1, 8, 2, T)).astype(np.float32) * 0.2)

    single = jax.jit(make_contrastive_train_step(enc, tx, 0.1))
    s1, loss1 = single(state, a, b)

    mesh = create_mesh(4)
    fsdp_state = shard_train_state(state, mesh, min_size=1)
    # at least one leaf must actually be sharded for this test to mean much
    assert any(
        len(getattr(l.sharding, "spec", ())) and l.sharding.spec[0] == "data"
        for l in jax.tree.leaves(fsdp_state.params)
    )
    step = make_fsdp_contrastive_step(enc, tx, mesh, state, 0.1, min_size=1)
    s2, loss2 = step(fsdp_state, a, b)

    assert abs(float(loss1) - float(loss2)) < 1e-5 * max(1.0, abs(float(loss1)))
    for p0, p1, p2 in zip(
        jax.tree.leaves(state.params),
        jax.tree.leaves(s1.params),
        jax.tree.leaves(s2.params),
    ):
        g1 = (np.asarray(p0) - np.asarray(p1)) / lr
        g2 = (np.asarray(p0) - np.asarray(p2)) / lr
        scale = max(np.max(np.abs(g1)), 1e-8)
        assert np.max(np.abs(g1 - g2)) / scale < 1e-4

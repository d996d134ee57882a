"""FXencoder contrastive training (SimCLR-style over FX-manipulated pairs).

TPU re-design of the reference training step (SURVEY.md §3.4; the reference
repo ships only datasets+losses, the trainer lived outside it): per
instrument, two FX-manipulated views (A, B) of different content are encoded
and pulled together with NT-Xent; other batch entries — including
strong negatives (same content, different FX) — are pushed apart.

Parallelism: 1-D ``data`` mesh; the batch (and the on-device FX
augmentation) is sharded, parameters are replicated, NT-Xent negatives ride
``all_gather`` over ICI, and gradients are ``pmean``-ed — replacing the
reference's DDP + gradient-preserving NCCL all_gather
(``training_utils.py:130-172``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import FXencoderConfig, TrainConfig
from ..losses import nt_xent_loss
from ..models import FXencoder
from .state import (
    TrainState,
    cast_floats,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)


def contrastive_loss_fn(
    encoder: FXencoder,
    params,
    batch_stats,
    batch_a: jnp.ndarray,
    batch_b: jnp.ndarray,
    temperature: float,
    axis_name: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, Any]:
    """NT-Xent loss over stacked per-instrument views.

    ``batch_a/b``: ``[n_inst, B_local, 2, Ta] / [..., Tb]`` — the same
    instruments' A and B views; losses are summed over instruments
    (reference trains all four stems jointly). The two views may have
    DIFFERENT durations (the reference collate draws ``input_length_a`` and
    ``input_length_b`` independently, ``data_loader.py:51``), so each view
    gets its own encoder forward — BN statistics update sequentially across
    the two forwards, as two eager torch calls would. With
    ``compute_dtype=bfloat16`` the encoder forward/backward runs in bf16;
    the NT-Xent similarities are always computed on f32-cast embeddings.
    """
    n_inst, B = batch_a.shape[0], batch_a.shape[1]
    xa = batch_a.reshape((n_inst * B,) + batch_a.shape[2:])
    xb = batch_b.reshape((n_inst * B,) + batch_b.shape[2:])

    mixed = compute_dtype != jnp.float32
    if mixed:
        # batch_stats stay f32 (BN computes statistics in f32 internally)
        params = cast_floats(params, compute_dtype)
        xa = xa.astype(compute_dtype)
        xb = xb.astype(compute_dtype)
    za, updates = encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        xa,
        mutable=["batch_stats"],
    )
    zb, updates = encoder.apply(
        {"params": params, "batch_stats": updates["batch_stats"]},
        xb,
        mutable=["batch_stats"],
    )
    za = za.astype(jnp.float32).reshape(n_inst, B, -1)
    zb = zb.astype(jnp.float32).reshape(n_inst, B, -1)

    loss = 0.0
    for i in range(n_inst):
        loss = loss + nt_xent_loss(za[i], zb[i], temperature, axis_name=axis_name)
    return loss, updates["batch_stats"]


def make_contrastive_train_step(
    encoder: FXencoder,
    tx: optax.GradientTransformation,
    temperature: float = 0.1,
    axis_name: Optional[str] = None,
    compute_dtype: str = "float32",
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], Tuple[TrainState, jnp.ndarray]]:
    """Build the (shardable) SGD step. When ``axis_name`` is given the step
    must run inside shard_map/pjit over that mesh axis."""
    cdtype = jnp.dtype(compute_dtype)

    def step(state: TrainState, batch_a, batch_b):
        def loss_fn(params):
            return contrastive_loss_fn(
                encoder, params, state.batch_stats, batch_a, batch_b,
                temperature, axis_name, cdtype,
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            # each shard's loss is already the *global* (gathered) objective;
            # under vma-typed shard_map AD the collective transposes account
            # for every shard's cotangent, so pmean reconstructs the exact
            # single-device gradient while psum would overcount by W
            # (measured: psum/true = W, pmean/true = 1; verified grad-level
            # in tests/test_train.py::test_contrastive_sharded_matches_single
            # — Adam's scale invariance masked this in round 1)
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, loss

    return step


def make_sharded_contrastive_step(
    encoder: FXencoder,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    temperature: float = 0.1,
    axis: str = "data",
    compute_dtype: str = "float32",
):
    """shard_map the train step over the mesh: batch sharded on ``axis``,
    state replicated. Returns a jitted function
    ``(state, batch_a [n_inst, B_global, 2, T], batch_b) -> (state, loss)``.
    """
    step = make_contrastive_train_step(
        encoder, tx, temperature, axis_name=axis, compute_dtype=compute_dtype
    )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# FSDP-style parameter/optimizer sharding (SURVEY.md §5.8 stretch)
# ---------------------------------------------------------------------------
def fsdp_specs(state: TrainState, n_shards: int, axis: str = "data", min_size: int = 1 << 14):
    """Per-leaf PartitionSpecs: large param / optimizer-moment leaves shard
    dim 0 over ``axis``; small leaves, counters, and ALL batch_stats
    replicate (BN statistics are consumed ungathered inside the loss and
    pmean-refreshed every step)."""

    def spec_of(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            len(shape) >= 1
            and shape[0] % n_shards == 0
            and int(np.prod(shape)) >= min_size
        ):
            return P(axis)
        return P()

    return TrainState(
        step=P(),
        params=jax.tree.map(spec_of, state.params),
        batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
        opt_state=jax.tree.map(spec_of, state.opt_state),
    )


def shard_train_state(state: TrainState, mesh: Mesh, axis: str = "data", min_size: int = 1 << 14) -> TrainState:
    """Lay the state out on the mesh per :func:`fsdp_specs` (1/W of the
    params + Adam moments per chip for the sharded leaves)."""
    from jax.sharding import NamedSharding

    n = int(np.prod(mesh.devices.shape))
    specs = fsdp_specs(state, n, axis, min_size)
    return jax.tree.map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)), state, specs
    )


def make_fsdp_contrastive_step(
    encoder: FXencoder,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state_example: TrainState,
    temperature: float = 0.1,
    axis: str = "data",
    compute_dtype: str = "float32",
    min_size: int = 1 << 14,
):
    """FSDP/ZeRO-style sharded train step: parameters AND optimizer moments
    live sharded over ``axis`` (1/W memory per chip); each step all-gathers
    the parameters at use, and the all_gather's transpose delivers each
    chip exactly its local slice of the global gradient, so the optimizer
    update itself runs on 1/W of the state. The 81M-param encoder
    does not *need* this on one v5e — it is the scaling path for bigger
    variants / tighter HBM (SURVEY.md §5.8 "FSDP-style sharding as a
    stretch"). Numerics match the replicated step exactly (tested).

    Feed it a state laid out by :func:`shard_train_state`; batches are
    ``[n_inst, B_global, 2, T]`` like the replicated sharded step.
    """
    cdtype = jnp.dtype(compute_dtype)
    n_shards = int(np.prod(mesh.devices.shape))
    specs = fsdp_specs(state_example, n_shards, axis, min_size)

    def gather(leaf, sp):
        if sp == P(axis):
            return jax.lax.all_gather(leaf, axis, axis=0, tiled=True)
        return leaf

    def step(state: TrainState, batch_a, batch_b):
        def loss_fn(local_params):
            full = jax.tree.map(gather, local_params, specs.params)
            return contrastive_loss_fn(
                encoder, full, state.batch_stats, batch_a, batch_b,
                temperature, axis, cdtype,
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # vma-typed shard_map AD already performs exact cotangent
        # bookkeeping across the collectives: sharded leaves arrive as the
        # TRUE gradient's local slice (the params-all_gather transpose), and
        # replicated leaves arrive as the true replicated gradient — both
        # measured at ratio 1.0000 vs the single-device gradient (and
        # asserted grad-level in tests/test_train.py::
        # test_fsdp_sharded_matches_single). pmean on replicated leaves is
        # kept as an explicit replication annotation (a no-op on the value).
        grads = jax.tree.map(
            lambda g, sp: g if sp == P(axis) else jax.lax.pmean(g, axis),
            grads,
            specs.params,
        )
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, loss

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(specs, P(None, axis), P(None, axis)),
        out_specs=(specs, P()),
    )
    return jax.jit(sharded)


def init_contrastive(
    config: Optional[FXencoderConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    seed: int = 0,
    example_length: int = 2**14,
) -> Tuple[FXencoder, TrainState, optax.GradientTransformation]:
    cfg = config or FXencoderConfig()
    tcfg = train_cfg or TrainConfig()
    # NCH for training: channels-last wins at inference but is a wash for
    # the training step (measured 65 vs 64 ms at production shapes) — keep
    # the layout both train steps are proven on
    encoder = FXencoder(
        config=cfg, train=True, channels_last=False, remat=tcfg.remat
    )
    # host-side init: module.init would jit a giant RNG program (minutes on
    # remote-compile rigs) just to draw fresh weights (models/fast_init.py)
    from ..models.fast_init import fast_init

    variables = fast_init(
        encoder, jnp.zeros((2, cfg.in_channels, example_length)), seed=seed
    )
    tx = make_optimizer(
        tcfg.learning_rate, tcfg.weight_decay, schedule=make_lr_schedule(tcfg)
    )
    return encoder, create_train_state(variables, tx), tx

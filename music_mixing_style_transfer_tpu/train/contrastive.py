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
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import FXencoderConfig, TrainConfig
from ..losses import nt_xent_loss
from ..models import FXencoder
from .state import TrainState, cast_floats, create_train_state, make_optimizer


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

    ``batch_a/b``: ``[n_inst, B_local, 2, T]`` — the same instruments'
    A and B views; losses are summed over instruments (reference trains all
    four stems jointly). With ``compute_dtype=bfloat16`` the encoder
    forward/backward runs in bf16; the NT-Xent similarities are always
    computed on f32-cast embeddings.
    """
    n_inst, B = batch_a.shape[0], batch_a.shape[1]
    xa = batch_a.reshape((n_inst * B,) + batch_a.shape[2:])
    xb = batch_b.reshape((n_inst * B,) + batch_b.shape[2:])
    x = jnp.concatenate([xa, xb], axis=0)

    mixed = compute_dtype != jnp.float32
    if mixed:
        # batch_stats stay f32 (BN computes statistics in f32 internally)
        params = cast_floats(params, compute_dtype)
        x = x.astype(compute_dtype)
    out, updates = encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        mutable=["batch_stats"],
    )
    out = out.astype(jnp.float32)
    za, zb = jnp.split(out, 2, axis=0)
    za = za.reshape(n_inst, B, -1)
    zb = zb.reshape(n_inst, B, -1)

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
            # each shard's loss is already the *global* (gathered) objective, so
            # the all_gather transpose has already psum-ed the cotangents from
            # every shard into the local activations: shard k's grad is
            # W * (shard k's partial of dL/dparams). pmean (= psum / W)
            # therefore reconstructs the exact single-device gradient — psum
            # here would double-count by a factor of W (verified grad-level in
            # tests/test_train.py::test_contrastive_sharded_matches_single;
            # Adam's scale invariance masked this in round 1)
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
    variables = encoder.init(
        jax.random.PRNGKey(seed), jnp.zeros((2, cfg.in_channels, example_length))
    )
    tx = make_optimizer(tcfg.learning_rate, tcfg.weight_decay)
    return encoder, create_train_state(variables, tx), tx

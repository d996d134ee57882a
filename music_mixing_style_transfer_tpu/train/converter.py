"""MixFXcloner (converter) training.

TPU re-design of the reference converter step (SURVEY.md §3.5): with a frozen
pretrained FXencoder, each example is a triplet
``(A1 input, A2 ground truth, B2 reference)`` where A2/B2 got the SAME random
FX; the TCN converts A1 conditioned on ``FXencoder(B2)`` and is trained with
the multi-scale mid/side spectral loss + RMS gain loss.

Data parallel over the ``data`` mesh axis, gradients pmean-ed.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TCNConfig, TrainConfig
from ..losses import multiscale_spectral_midside, multiscale_spectral_stereo, rms_loss
from ..models import FXencoder, MixFXcloner
from .state import (
    TrainState,
    cast_floats,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)


def converter_loss_fn(
    converter: MixFXcloner,
    encoder: FXencoder,
    params,
    batch_stats,
    enc_vars: Dict[str, Any],
    a1: jnp.ndarray,
    a2: jnp.ndarray,
    b2: jnp.ndarray,
    rms_weight: float = 0.1,
    compute_dtype: jnp.dtype = jnp.float32,
    ori_weight: float = 0.0,
) -> Tuple[jnp.ndarray, Any]:
    """``a1/a2/b2``: ``[B_local, 2, T]`` stacked across instruments upstream.

    With ``compute_dtype=bfloat16`` the model forward/backward runs on the
    MXU's fast bf16 passes; params, batch stats, and the spectral losses
    stay float32 (losses always computed on f32-cast predictions).

    ``ori_weight`` adds the reference's ``mode='ori'`` per-channel L/R
    spectral term (``loss.py:154-177``) on top of the mid/side mode: the
    mid/side magnitudes alone cannot see a static channel imbalance, which
    in practice the converter exploits (round-4/5 panning blowup)."""
    mixed = compute_dtype != jnp.float32
    if mixed:
        # batch_stats stay f32: train-mode BatchNorm computes/updates its
        # statistics in f32 internally (models/blocks.py)
        params = cast_floats(params, compute_dtype)
        enc_vars = cast_floats(enc_vars, compute_dtype)
        a1, b2 = a1.astype(compute_dtype), b2.astype(compute_dtype)
    emb = jax.lax.stop_gradient(encoder.apply(enc_vars, b2))
    pred, updates = converter.apply(
        {"params": params, "batch_stats": batch_stats},
        a1,
        emb,
        mutable=["batch_stats"],
    )
    pred = pred.astype(jnp.float32)
    new_stats = updates["batch_stats"]
    loss = multiscale_spectral_midside(pred, a2) + rms_weight * rms_loss(pred, a2)
    if ori_weight:
        loss = loss + ori_weight * multiscale_spectral_stereo(pred, a2)
    return loss, new_stats


def make_converter_train_step(
    converter: MixFXcloner,
    encoder: FXencoder,
    tx: optax.GradientTransformation,
    rms_weight: float = 0.1,
    axis_name: Optional[str] = None,
    compute_dtype: str = "float32",
    ori_weight: float = 0.0,
) -> Callable:
    """Returns ``step(state, enc_vars, a1, a2, b2)``.

    The frozen encoder variables are a call ARGUMENT: closure capture would
    inline all 81M params as HLO *constants* (a 650MB program that remote
    compilation rejects and that bloats every executable).
    """
    cdtype = jnp.dtype(compute_dtype)

    def step(state: TrainState, enc_vars_arg, a1, a2, b2):
        def loss_fn(params):
            return converter_loss_fn(
                converter, encoder, params, state.batch_stats, enc_vars_arg,
                a1, a2, b2, rms_weight, cdtype, ori_weight,
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    return step


def make_sharded_converter_step(
    converter: MixFXcloner,
    encoder: FXencoder,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    rms_weight: float = 0.1,
    axis: str = "data",
    compute_dtype: str = "float32",
    ori_weight: float = 0.0,
):
    """Returns jitted ``step(state, enc_vars, a1, a2, b2)`` over the mesh."""
    step = make_converter_train_step(
        converter, encoder, tx, rms_weight, axis_name=axis,
        compute_dtype=compute_dtype, ori_weight=ori_weight,
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # the FFT transpose rule in the spectral loss confuses the static
        # varying-axes checker (cotangent vma mismatch); the computation is
        # purely batch-sharded so the check adds nothing here
        check_vma=False,
    )
    return jax.jit(sharded)


def init_converter(
    config: Optional[TCNConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    seed: int = 0,
    example_length: int = 2**14,
) -> Tuple[MixFXcloner, TrainState, optax.GradientTransformation]:
    cfg = config or TCNConfig()
    tcfg = train_cfg or TrainConfig()
    # NCH for training: the folded-NHWC conv backward materializes padded
    # copies per block — RESOURCE_EXHAUSTED at production triplet shapes
    # (8 x 3 s, measured); the NCH backward fits at 668 ms/step. Inference
    # defaults to channels-last.
    converter = MixFXcloner(
        config=cfg, train=True, channels_last=False, remat=tcfg.remat
    )
    # host-side init, not a jitted init program (models/fast_init.py)
    from ..models.fast_init import fast_init

    variables = fast_init(
        converter,
        jnp.zeros((2, cfg.ninputs, example_length)),
        jnp.zeros((2, cfg.condition_dimension)),
        seed=seed,
    )
    tx = make_optimizer(
        tcfg.learning_rate, tcfg.weight_decay, schedule=make_lr_schedule(tcfg)
    )
    return converter, create_train_state(variables, tx), tx

"""Training state: params + batch stats + optimizer, as a pytree."""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    variables: Dict[str, Any], tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_lr_schedule(train_cfg) -> Any:
    """Learning-rate schedule from ``TrainConfig`` fields.

    The reference's checkpoints carry optimizer AND scheduler state
    (``modules/training_utils.py:13-29,33-96``); here the schedule is a pure
    function of the optax step counter, which lives inside ``opt_state`` —
    so an orbax restore resumes mid-schedule exactly (no separate scheduler
    object to serialize).

    Returns a float (constant LR) or an ``optax.Schedule``.
    """
    lr = train_cfg.learning_rate
    kind = getattr(train_cfg, "lr_schedule", "constant")
    warmup = int(getattr(train_cfg, "lr_warmup_steps", 0))
    if kind == "constant":
        if warmup > 0:
            return optax.linear_schedule(0.0, lr, warmup)
        return lr
    if kind == "warmup_cosine":
        decay = int(train_cfg.lr_decay_steps)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=warmup,
            decay_steps=max(decay, warmup + 1),
            end_value=lr * float(train_cfg.lr_end_factor),
        )
    if kind == "step":
        # reference-style epoch/step decay: lr * gamma^(step // step_size)
        sched = optax.exponential_decay(
            init_value=lr,
            transition_steps=int(train_cfg.lr_step_size),
            decay_rate=float(train_cfg.lr_gamma),
            staircase=True,
        )
        if warmup > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), sched], [warmup]
            )
        return sched
    raise ValueError(f"unknown lr_schedule {kind!r}")


def make_optimizer(
    learning_rate: float = 2e-4,
    weight_decay: float = 0.0,
    schedule: Any = None,
) -> optax.GradientTransformation:
    """``schedule``: optional float or optax schedule overriding the constant
    ``learning_rate`` (see :func:`make_lr_schedule`). The schedule's step
    counter is part of ``opt_state``, so checkpoint restore resumes the LR
    sequence exactly where it left off."""
    lr = schedule if schedule is not None else learning_rate
    if weight_decay > 0:
        return optax.adamw(lr, weight_decay=weight_decay)
    return optax.adam(lr)


def current_lr(train_cfg, step) -> float:
    """LR at optimizer step ``step`` (for logging; matches the optimizer's
    internal schedule evaluation)."""
    sched = make_lr_schedule(train_cfg)
    return float(sched if not callable(sched) else sched(step))


def cast_floats(tree, dtype):
    """Cast floating leaves of a pytree to ``dtype`` (mixed-precision compute)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )

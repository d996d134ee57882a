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


def make_optimizer(
    learning_rate: float = 2e-4, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    if weight_decay > 0:
        return optax.adamw(learning_rate, weight_decay=weight_decay)
    return optax.adam(learning_rate)


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

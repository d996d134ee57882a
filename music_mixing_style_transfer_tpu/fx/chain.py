"""Augmentation chains: probability-gated, order-shuffled FX composition.

TPU re-design of the reference ``AugmentationChain``
(``common_audioeffects.py:91-201``). The reference mutates a processor list
per call on the host; here a chain is a *static* tree of stages whose single
``__call__(key, x_stack)`` traces to one XLA graph:

- "apply with probability p"  -> bernoulli-gated ``jnp.where`` (both paths are
  computed; on TPU the wasted FLOPs are cheaper than a host branch).
- "shuffle order"             -> ``lax.switch`` over the (static) set of
  permutations (the system only shuffles 2-element groups).
- "same FX for every element" -> parameters are sampled once per stage and
  the processor is vmapped over the stack of segments (this is what creates
  contrastive positive pairs, ``common_audioeffects.py:156-192``).
- "parallel" chains mix ``w*x + (1-w)*chain(x)`` with w ~ U(0, 0.5) or fixed
  (``common_audioeffects.py:186-190``).
"""
from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .processors import rms_normalize


class Stage:
    """One chain entry: (processor-or-chain, apply probability, rms-normalize).

    ``prob_name``/``prob_scale`` make the stage's probability DYNAMIC: when
    the chain is called with a ``probs`` dict containing ``prob_name``, the
    gate uses ``probs[prob_name] * prob_scale`` as a *traced* scalar instead
    of the baked ``prob`` constant. This is what lets probability scheduling
    (the paper's "ps") run a whole training schedule through ONE compiled
    executable — the 4-instrument augmentation program is ~67 MB and takes
    minutes to compile, so re-tracing it per epoch (the torch-free analogue
    of the reference rebuilding its processor lists per call) is not viable
    on TPU. Bit-identical to the static path at equal values: the bernoulli
    consumes the same uniform bits either way.
    """

    def __init__(
        self,
        fx,
        prob: float = 1.0,
        rms_norm: bool = True,
        prob_name: Optional[str] = None,
        prob_scale: float = 1.0,
    ):
        self.fx = fx
        self.prob = float(prob)
        self.rms_norm = bool(rms_norm)
        self.prob_name = prob_name
        self.prob_scale = float(prob_scale)

    @property
    def is_chain(self) -> bool:
        return isinstance(self.fx, AugmentationChain)


class AugmentationChain:
    """Jittable augmentation chain over a stack of audio segments.

    Call signature: ``chain(key, x) -> y`` with ``x [n_items, 2, T]``; the
    same (randomly sampled) effects are applied to every item.
    """

    def __init__(
        self,
        stages: Sequence[Union[Stage, Tuple]],
        shuffle: bool = False,
        parallel: bool = False,
        parallel_weight_factor: Optional[float] = None,
    ):
        self.stages: List[Stage] = [
            s if isinstance(s, Stage) else Stage(*s) for s in stages
        ]
        self.shuffle = shuffle
        self.parallel = parallel
        self.parallel_weight_factor = parallel_weight_factor
        if shuffle and len(self.stages) > 3:
            raise ValueError(
                "shuffle is implemented as a lax.switch over permutations; "
                f"{len(self.stages)}! branches would bloat the program. "
                "Restructure the chain (the reference only shuffles pairs)."
            )

    # ------------------------------------------------------------------
    def _apply_stage(
        self, stage: Stage, key, x: jnp.ndarray, probs=None
    ) -> jnp.ndarray:
        k_gate, k_param = jax.random.split(key)
        if stage.is_chain:
            wet = stage.fx(k_param, x, probs)
        else:
            params = stage.fx.sample(k_param)
            wet = jax.vmap(lambda xi: stage.fx.apply(params, xi))(x)
            if stage.rms_norm:
                wet = jax.vmap(rms_normalize)(x, wet)
        p_dyn = None
        if probs is not None and stage.prob_name is not None:
            if stage.prob_name in probs:
                p_dyn = probs[stage.prob_name] * stage.prob_scale
        if p_dyn is None:
            if stage.prob >= 1.0:
                return wet
            gate = jax.random.bernoulli(k_gate, stage.prob)
        else:
            gate = jax.random.bernoulli(k_gate, jnp.clip(p_dyn, 0.0, 1.0))
        return jnp.where(gate, wet, x)

    def _apply_ordered(
        self, order: Sequence[int], keys, x: jnp.ndarray, probs=None
    ) -> jnp.ndarray:
        for i in order:
            x = self._apply_stage(self.stages[i], keys[i], x, probs)
        return x

    def __call__(self, key, x: jnp.ndarray, probs=None) -> jnp.ndarray:
        """Apply the chain. ``probs`` (optional): dict of DYNAMIC apply
        probabilities for named stages (see :class:`Stage`); traced values,
        so one jit serves every probability-schedule point."""
        n = len(self.stages)
        k_perm, k_par, *stage_keys = jax.random.split(key, n + 2)

        if self.shuffle and n > 1:
            perms = list(itertools.permutations(range(n)))
            idx = jax.random.randint(k_perm, (), 0, len(perms))
            y = jax.lax.switch(
                idx,
                [
                    (lambda p: (lambda: self._apply_ordered(p, stage_keys, x, probs)))(perm)
                    for perm in perms
                ],
            )
        else:
            y = self._apply_ordered(range(n), stage_keys, x, probs)

        if self.parallel:
            if self.parallel_weight_factor is not None:
                w = self.parallel_weight_factor
            else:
                w = jax.random.uniform(k_par) / 2.0
            y = w * x + (1.0 - w) * y
        return y

"""Batched multi-draw evaluation of augmentation chains — the training hot path.

The generic :class:`~.chain.AugmentationChain` evaluates ONE (instrument,
item, k) draw per call; the trainers vmap it per instrument and loop
instruments in Python (``train/fused.py``), which leaves every DSP op
running at 1/n_inst of the available lane parallelism and replays the whole
chain graph n_inst times per step. Measured on the v5e chip this made
augmentation ~1.56 s/step against a 78 ms train step (the four per-inst
chains cost ~390-415 ms EACH at 16 lanes, while the same ops at 128 lanes
cost barely more than at 16 — scan/FFT fixed costs dominate).

This module evaluates MANY draws through structurally identical chains in
one pass per stage:

- all instruments' chains walk as ONE stage tree; per-stage parameters are
  sampled per draw (vmap) and the processor applies once over the full
  ``[D, items, 2, T]`` draw batch;
- per-group differences in BAKED gate probabilities (e.g. the per-instrument
  reverb probability, ``fx/factory.py:DEFAULT_REVERB_PROB``) become a
  per-draw probability VECTOR feeding the same bernoulli draw — numerically
  identical to the per-chain constants (equal p, same key bits);
- structurally DIVERGENT stages (the drums dual-band reverb,
  ``audio_effects_chain.py:117-141`` in the reference) split the draw axis
  into contiguous same-signature runs, evaluated separately and
  re-concatenated;
- 2-stage shuffled groups (eq/comp, pan/imager) replace the
  ``lax.switch``-over-permutations (which vmap batches into "compute both
  branches then select" — 2 evaluations of both stages) with the equivalent
  two-round form ``h = select(flag, s0(x), s1(x)); y = select(flag, s1(h),
  s0(h))`` — same op count, but every op batched over ALL draws;
- the compressor's sequential envelope runs on the fused Pallas kernel
  (``ops/pallas/envelope.py``) on TPU backends: 11.5 ms vs 134 ms for the
  ``lax.scan`` path at the training load (128 lanes x 131k samples),
  max |diff| 4e-7.

Key-routing is bit-compatible with ``AugmentationChain.__call__`` /
``_apply_stage`` (same ``jax.random.split`` tree per draw), so this is a
pure evaluation-strategy change — asserted against the generic path in
``tests/test_fastpath.py``. Reference semantics unchanged:
``mixing_manipulator/common_audioeffects.py:91-201``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .chain import AugmentationChain, Stage
from .processors import Compressor, rms_normalize


class UnsupportedTopology(Exception):
    """Raised when a chain shape has no batched evaluation strategy."""


# ---------------------------------------------------------------------------
# structural signatures (decide which draws can share one evaluation)
# ---------------------------------------------------------------------------
def _cfg_value(v):
    if isinstance(v, (int, float, str, bool, type(None))):
        return v
    if isinstance(v, tuple):
        return tuple(_cfg_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _cfg_value(x)) for k, x in v.items()))
    # arrays (IR banks etc.): merge only when literally the same object
    return id(v)


def _sig(fx):
    if isinstance(fx, AugmentationChain):
        return (
            "chain",
            fx.shuffle,
            fx.parallel,
            fx.parallel_weight_factor,
            tuple(_stage_sig(s) for s in fx.stages),
        )
    return (type(fx).__name__, _cfg_value(vars(fx)))


def _stage_sig(stage: Stage):
    # baked `prob` is deliberately EXCLUDED: per-group baked probabilities
    # merge into a per-draw vector at evaluation time (same bernoulli bits)
    return (stage.prob_name, stage.prob_scale, stage.rms_norm, _sig(stage.fx))


# ---------------------------------------------------------------------------
# batched processor application
# ---------------------------------------------------------------------------
def _apply_batched(fx, params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply one processor with per-draw ``params`` over ``x [D, I, C, T]``."""
    if (
        isinstance(fx, Compressor)
        and not fx.blockwise
        and jax.default_backend() == "tpu"
    ):
        # sequential envelope -> fused Pallas kernel (exact recurrence,
        # ops/pallas/envelope.py; ~12x the lax.scan path at training shapes)
        from ..ops.pallas.envelope import compressor_pallas

        rep = int(np.prod(x.shape[1:-1]))
        lanes = x.reshape(-1, x.shape[-1])
        r = lambda v: jnp.repeat(jnp.asarray(v, jnp.float32), rep)
        y = compressor_pallas(
            lanes,
            r(params["threshold"]),
            r(params["attack_ms"]),
            r(params["release_ms"]),
            r(params["ratio"]),
            sample_rate=fx.sample_rate,
        )
        return y.reshape(x.shape)
    return jax.vmap(
        lambda p, xd: jax.vmap(lambda xi: fx.apply(p, xi))(xd)
    )(params, x)


def _bcast(v, x):
    return jnp.reshape(v, (-1,) + (1,) * (x.ndim - 1))


# ---------------------------------------------------------------------------
# grouped evaluation
# ---------------------------------------------------------------------------
def _contiguous_runs(items: Sequence, sig_of) -> List[List[int]]:
    runs: List[List[int]] = [[0]]
    for i in range(1, len(items)):
        if sig_of(items[i]) == sig_of(items[runs[-1][0]]):
            runs[-1].append(i)
        else:
            runs.append([i])
    return runs


def _eval_generic(chain: AugmentationChain, keys, x, probs):
    """Safety net for exotic shapes: per-draw vmap of the original chain
    (still batched over the draw axis)."""
    if probs is None:
        return jax.vmap(lambda k, xi: chain(k, xi))(keys, x)
    in_axes_probs = {
        k: 0 if (hasattr(v, "ndim") and v.ndim) else None for k, v in probs.items()
    }
    return jax.vmap(
        lambda k, xi, pr: chain(k, xi, pr), in_axes=(0, 0, in_axes_probs)
    )(keys, x, probs)


def eval_grouped(
    chains: Sequence[AugmentationChain],
    sizes: Sequence[int],
    keys: jnp.ndarray,  # [D, 2] uint32
    x: jnp.ndarray,     # [D, I, C, T]
    probs: Optional[Dict] = None,
) -> jnp.ndarray:
    """Evaluate per-group chains over their contiguous draw slices.

    ``chains[g]`` serves draws ``sum(sizes[:g]) : sum(sizes[:g+1])``; all
    groups are evaluated through one stage tree wherever their structures
    align (see module docstring).
    """
    c0 = chains[0]
    same_shape = all(
        isinstance(c, AugmentationChain)
        and len(c.stages) == len(c0.stages)
        and c.shuffle == c0.shuffle
        and c.parallel == c0.parallel
        and c.parallel_weight_factor == c0.parallel_weight_factor
        for c in chains
    )
    full_sig_equal = same_shape and all(_sig(c) == _sig(c0) for c in chains[1:])
    if not same_shape or (c0.shuffle and not full_sig_equal):
        if len(chains) == 1:
            # single group with an unbatchable shape (e.g. >2-stage shuffle)
            return _eval_generic(c0, keys, x, _slice_probs(probs, 0, x.shape[0]))
        return _eval_runs(chains, sizes, keys, x, probs, _sig)

    n = len(c0.stages)
    D = x.shape[0]
    ks = jax.vmap(lambda k: jax.random.split(k, n + 2))(keys)  # [D, n+2, 2]
    k_par, skeys = ks[:, 1], ks[:, 2:]

    if c0.shuffle and n == 2:
        idx = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2))(ks[:, 0])
        flag = _bcast(idx == 0, x)
        s0 = lambda xx: _eval_stage([c.stages[0] for c in chains], sizes, skeys[:, 0], xx, probs)
        s1 = lambda xx: _eval_stage([c.stages[1] for c in chains], sizes, skeys[:, 1], xx, probs)
        h = jnp.where(flag, s0(x), s1(x))
        y = jnp.where(flag, s1(h), s0(h))
    elif c0.shuffle and n > 1:
        # >2-stage shuffle: no batched strategy — per-draw vmap of the
        # original chain, one group at a time (baked probs are per group)
        if len(set(map(id, chains))) == 1:  # one distinct chain -> one vmap
            return _eval_generic(c0, keys, x, probs)
        return _eval_runs(chains, sizes, keys, x, probs, id)
    else:
        y = x
        for i in range(n):
            y = _eval_stage([c.stages[i] for c in chains], sizes, skeys[:, i], y, probs)

    if c0.parallel:
        if c0.parallel_weight_factor is not None:
            w = jnp.asarray(c0.parallel_weight_factor, x.dtype)
        else:
            w = _bcast(jax.vmap(jax.random.uniform)(k_par) / 2.0, x)
        y = w * x + (1.0 - w) * y
    return y


def _slice_probs(probs, lo, hi):
    if probs is None:
        return None
    return {
        k: (v[lo:hi] if (hasattr(v, "ndim") and getattr(v, "ndim", 0)) else v)
        for k, v in probs.items()
    }


def _eval_runs(nodes, sizes, keys, x, probs, sig_of, stage_level=False):
    """Split groups into contiguous same-signature runs; evaluate each run
    on its draw slice and re-concatenate in order."""
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    outs = []
    for run in _contiguous_runs(nodes, sig_of):
        lo, hi = offsets[run[0]], offsets[run[-1] + 1]
        sub_nodes = [nodes[i] for i in run]
        sub_sizes = [sizes[i] for i in run]
        pr = _slice_probs(probs, lo, hi)
        if stage_level:
            outs.append(_eval_stage(sub_nodes, sub_sizes, keys[lo:hi], x[lo:hi], pr))
        else:
            outs.append(eval_grouped(sub_nodes, sub_sizes, keys[lo:hi], x[lo:hi], pr))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _eval_stage(
    stages: Sequence[Stage],
    sizes: Sequence[int],
    keys: jnp.ndarray,  # [D, 2]
    x: jnp.ndarray,     # [D, I, C, T]
    probs: Optional[Dict],
) -> jnp.ndarray:
    """Batched ``AugmentationChain._apply_stage`` over all groups' draws."""
    s0 = stages[0]
    sig0 = _stage_sig(s0)
    if not all(_stage_sig(s) == sig0 for s in stages[1:]):
        return _eval_runs(stages, sizes, keys, x, probs, _stage_sig, stage_level=True)

    kk = jax.vmap(lambda k: jax.random.split(k))(keys)  # [D, 2, 2]
    kg, kp = kk[:, 0], kk[:, 1]

    if s0.is_chain:
        wet = eval_grouped([s.fx for s in stages], sizes, kp, x, probs)
    else:
        params = jax.vmap(s0.fx.sample)(kp)
        wet = _apply_batched(s0.fx, params, x)
        if s0.rms_norm:
            wet = jax.vmap(jax.vmap(rms_normalize))(x, wet)

    # gate probability: dynamic (scheduled) > baked per-group constants
    p_dyn = None
    if probs is not None and s0.prob_name is not None and s0.prob_name in probs:
        p_dyn = probs[s0.prob_name] * s0.prob_scale
    if p_dyn is None:
        bakes = [float(s.prob) for s in stages]
        if all(b >= 1.0 for b in bakes):
            return wet  # same as _apply_stage's prob>=1 shortcut (kg unused)
        p = jnp.concatenate(
            [jnp.full((sz,), b, jnp.float32) for b, sz in zip(bakes, sizes)]
        ) if len(set(bakes)) > 1 else jnp.asarray(bakes[0], jnp.float32)
    else:
        p = jnp.clip(jnp.asarray(p_dyn, jnp.float32), 0.0, 1.0)
    if getattr(p, "ndim", 0):
        gate = jax.vmap(jax.random.bernoulli)(kg, p)
    else:
        gate = jax.vmap(lambda k: jax.random.bernoulli(k, p))(kg)
    return jnp.where(_bcast(gate, x), wet, x)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------
def eval_manipulators_batched(
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    keys: jnp.ndarray,  # [D, 2] uint32, instrument-major draw order
    x: jnp.ndarray,     # [D, I, C, T] float
    draws_per_inst: int,
    probs: Optional[Dict] = None,
) -> jnp.ndarray:
    """Evaluate per-instrument chains over an instrument-major draw batch.

    Drop-in for ``vmap(manipulators[inst])`` looped over instruments
    (``train/fused.py``), with every stage batched across all instruments'
    draws wherever the chain structures align.
    """
    chains = [manipulators[i] for i in instruments]
    sizes = [draws_per_inst] * len(chains)
    if x.shape[0] != draws_per_inst * len(chains):
        raise ValueError(
            f"draw batch {x.shape[0]} != {len(chains)} insts x {draws_per_inst}"
        )
    return eval_grouped(chains, sizes, keys, x, probs)

"""Fused-augmentation training: FX manipulation runs on device, inside the
training dispatch chain — raw PCM in, scalar loss out.

The legacy data path (``data/datasets.py``) manipulates segments on device,
downloads them, collates on host, and re-uploads the batch — three
full-batch trips over the host<->device link per step. On the slow-link
serving topology this repo benches on (DESIGN.md §4: ~42 MB/s serialized
tunnel) that is the entire step budget. Here the host uploads raw int16 PCM
segments + PRNG keys + crop offsets once (~8x less traffic for the
contrastive step) and only the scalar loss ever comes back.

Two shapes of the idea:

- :class:`FusedContrastivePipeline` — TWO dispatches with the data resident
  on device between them. The random-duration collate draws a new bucketed
  ``(la, lb)`` pair per STEP and probability scheduling rebuilds the FX
  chains per EPOCH; one monolithic jit would recompile on the product
  (shape-buckets x epochs, 20-40 s each over the tunnel). Splitting at the
  full-length-views boundary keeps every byte on device while each side
  compiles on its own axis only: augmentation once per chain build, the
  cropped train step once per shape pair for the whole run.
- :func:`make_fused_contrastive_step` / :func:`make_fused_converter_step` —
  single-jit variants for fixed shapes (the converter has no random-duration
  collate, so the product problem never arises there).

Numerics are IDENTICAL to the legacy path (same key layout, same crop plan —
asserted in tests/test_fused_train.py): this is a transport optimization,
not a training-semantics change. Reference semantics unchanged:
``data_loader.py:115-348`` (contrastive pairs), ``:356-539`` (triplets),
``:33-102`` (variable-length collate).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..fx.chain import AugmentationChain
from ..fx.fastpath import UnsupportedTopology, eval_manipulators_batched
from .contrastive import make_contrastive_train_step
from .converter import make_converter_train_step
from .state import TrainState


def _dequant(segs: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1, 1); float32 passes through."""
    if segs.dtype == jnp.int16:
        return segs.astype(jnp.float32) * (1.0 / 32768.0)
    return segs


def _crop(stack: jnp.ndarray, starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """Per-item random-offset fixed-length crop ``[B, 2, L] -> [B, 2, length]``."""
    return jax.vmap(
        lambda v, s: jax.lax.dynamic_slice_in_dim(v, s, length, axis=-1)
    )(stack, starts)


def crop_views(views: jnp.ndarray, starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """``[n_inst, B, 2, L] -> [n_inst, B, 2, length]`` with per-item starts
    shared across instruments (the collate's contract, data_loader.py:60-75)."""
    return jax.vmap(lambda inst_stack: _crop(inst_stack, starts, length))(views)


def augment_contrastive_views(
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    segs: jnp.ndarray,   # [n_inst, items, 2(content A/B), 2(ch), L_load]
    keys: jnp.ndarray,   # [n_inst, items, K, 2] uint32
    pad: int,
    probs=None,
    fast: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device reproduction of ``ContrastivePairDataset.sample_batch``:
    per (item, k) one FX draw applied to BOTH content segments (the
    contrastive positive pair), pad trimmed, clipped. Returns full-length
    views ``([n_inst, items*K, 2, L], [same])`` ready for :func:`crop_views`.

    ``probs``: optional dict of DYNAMIC apply probabilities (the scheduled
    keys eq/comp/pan/imager/gain — NOT the per-instrument reverb, which
    stays a per-chain constant); traced, so every point of a probability
    schedule rides one executable (fx/chain.py Stage).

    ``fast=True`` (default) evaluates all instruments' chains through the
    batched stage-tree walker (``fx/fastpath.py``) — ~6x the per-instrument
    vmap loop on the chip, same numerics (tests/test_fastpath.py). Falls
    back to the generic path for chain shapes it cannot batch.
    """
    x = _dequant(segs)
    if fast:
        try:
            return _augment_contrastive_fast(
                manipulators, instruments, x, keys, pad, probs
            )
        except UnsupportedTopology:
            pass
    batch_a, batch_b = [], []
    for i, inst in enumerate(instruments):
        chain = manipulators[inst]
        # vmap over K draws (inner, content pair broadcast), then over items
        man = jax.vmap(
            jax.vmap(lambda k, xi: chain(k, xi, probs), in_axes=(0, None)),
            in_axes=(0, 0),
        )(keys[i], x[i])  # [items, K, 2, 2, L_load]
        if pad:
            man = man[..., pad:-pad]
        man = jnp.clip(man, -1.0, 1.0)
        man = man.reshape((-1,) + man.shape[2:])  # [items*K, 2, 2, L]
        batch_a.append(man[:, 0])
        batch_b.append(man[:, 1])
    return jnp.stack(batch_a), jnp.stack(batch_b)


def _augment_contrastive_fast(manipulators, instruments, x, keys, pad, probs):
    """Batched-draw evaluation of :func:`augment_contrastive_views`: draw
    axis = (inst, item, k) instrument-major; content pairs are repeated per
    k-draw so one chain call covers all (inst, item, k) at full lane
    parallelism."""
    n_inst, B = x.shape[0], x.shape[1]
    K = keys.shape[2]
    x_draws = jnp.repeat(
        x.reshape((n_inst * B, 1) + x.shape[2:]), K, axis=1
    ).reshape((n_inst * B * K,) + x.shape[2:])  # [D, 2, 2, L_load]
    y = eval_manipulators_batched(
        manipulators, instruments, keys.reshape(-1, 2), x_draws, B * K, probs
    )
    if pad:
        y = y[..., pad:-pad]
    y = jnp.clip(y, -1.0, 1.0)
    y = y.reshape((n_inst, B * K) + y.shape[1:])  # [n_inst, items*K, 2, 2, L]
    return y[:, :, 0], y[:, :, 1]


class FusedContrastivePipeline:
    """Device-resident contrastive training: ``augment -> crop+step`` as two
    chained dispatches, nothing ever downloaded but the scalar loss.

    ``set_chains`` is called whenever probability scheduling rebuilds the FX
    chains (once per epoch); ``step`` memoizes one compiled train step per
    bucketed ``(la, lb)`` shape pair. With a mesh, items shard over ``axis``
    end to end (augmentation is embarrassingly parallel; NT-Xent negatives
    ride ``all_gather`` inside the inner step), so both the item count and
    ``items * K`` must be divisible by the mesh size.
    """

    def __init__(
        self,
        encoder,
        tx: optax.GradientTransformation,
        temperature: float = 0.1,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        compute_dtype: str = "float32",
    ):
        self.encoder, self.tx = encoder, tx
        self.temperature = temperature
        self.mesh, self.axis = mesh, axis
        self.compute_dtype = compute_dtype
        self._chains = None
        self._augment: Dict[bool, Callable] = {}
        self._steps: Dict[Tuple[int, int], Callable] = {}
        self._loss_fns: Dict[Tuple[int, int], Callable] = {}

    def set_chains(
        self,
        manipulators: Dict[str, AugmentationChain],
        instruments: Sequence[str],
        pad: int,
    ) -> None:
        """Bind the FX chains. With probability scheduling, call this ONCE
        and pass the per-epoch ``probs`` to :meth:`step` instead — the
        4-instrument augmentation program takes minutes to compile, and
        dynamic probs let the whole schedule reuse one executable."""
        self._chains = (manipulators, tuple(instruments), pad)
        self._augment = {}

    def _get_augment(self, dynamic: bool):
        fn = self._augment.get(dynamic)
        if fn is not None:
            return fn
        manipulators, instruments, pad = self._chains

        if dynamic:
            def aug(segs, keys, probs):
                return augment_contrastive_views(
                    manipulators, instruments, segs, keys, pad, probs
                )
            in_specs = (P(None, self.axis), P(None, self.axis), P())
        else:
            def aug(segs, keys):
                return augment_contrastive_views(
                    manipulators, instruments, segs, keys, pad
                )
            in_specs = (P(None, self.axis), P(None, self.axis))

        if self.mesh is not None:
            aug = jax.shard_map(
                aug,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(None, self.axis), P(None, self.axis)),
                # per-item parallel, no collectives; the FX chains' scans
                # (compressor envelope) trip the vma check spuriously
                check_vma=False,
            )
        fn = self._augment[dynamic] = jax.jit(aug)
        return fn

    def _build_step(self, la: int, lb: int) -> Callable:
        inner = make_contrastive_train_step(
            self.encoder,
            self.tx,
            self.temperature,
            axis_name=self.axis if self.mesh is not None else None,
            compute_dtype=self.compute_dtype,
        )

        def step(state: TrainState, a_full, b_full, sa, sb):
            return inner(
                state, crop_views(a_full, sa, la), crop_views(b_full, sb, lb)
            )

        if self.mesh is not None:
            step = jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(
                    P(),
                    P(None, self.axis),
                    P(None, self.axis),
                    P(self.axis),
                    P(self.axis),
                ),
                out_specs=(P(), P()),
            )
        return jax.jit(step)

    def _build_loss(self, la: int, lb: int) -> Callable:
        """Loss-only twin of :meth:`_build_step` (held-out validation:
        same augmentation+crop, no parameter update, BN updates discarded)."""
        from .contrastive import contrastive_loss_fn

        cdtype = jnp.dtype(self.compute_dtype)
        axis = self.axis if self.mesh is not None else None

        def lossf(state: TrainState, a_full, b_full, sa, sb):
            loss, _ = contrastive_loss_fn(
                self.encoder, state.params, state.batch_stats,
                crop_views(a_full, sa, la), crop_views(b_full, sb, lb),
                self.temperature, axis, cdtype,
            )
            return loss

        if self.mesh is not None:
            lossf = jax.shard_map(
                lossf,
                mesh=self.mesh,
                in_specs=(
                    P(), P(None, self.axis), P(None, self.axis),
                    P(self.axis), P(self.axis),
                ),
                out_specs=P(),
            )
        return jax.jit(lossf)

    def loss(
        self, state: TrainState, segs, keys, sa, sb, la: int, lb: int,
        probs: Optional[Dict[str, float]] = None,
    ) -> jnp.ndarray:
        """Loss on a (validation) batch — augment + crop + NT-Xent, no
        update. Memoizes one executable per ``(la, lb)`` like :meth:`step`."""
        if self._chains is None:
            raise RuntimeError("call set_chains() before loss()")
        if probs is not None:
            a_full, b_full = self._get_augment(True)(
                jnp.asarray(segs), jnp.asarray(keys),
                {k: jnp.float32(v) for k, v in probs.items()},
            )
        else:
            a_full, b_full = self._get_augment(False)(
                jnp.asarray(segs), jnp.asarray(keys)
            )
        fn = self._loss_fns.get((la, lb))
        if fn is None:
            fn = self._loss_fns[(la, lb)] = self._build_loss(la, lb)
        return fn(state, a_full, b_full, jnp.asarray(sa), jnp.asarray(sb))

    def step(
        self, state: TrainState, segs, keys, sa, sb, la: int, lb: int,
        probs: Optional[Dict[str, float]] = None,
    ) -> Tuple[TrainState, jnp.ndarray]:
        """One training step. ``probs``: optional scheduled apply
        probabilities ({eq, comp, pan, imager, gain}) fed as traced scalars;
        omit for the chains\' baked constants."""
        if self._chains is None:
            raise RuntimeError("call set_chains() before step()")
        if self.mesh is not None:
            n = self.mesh.devices.size
            if segs.shape[1] % n or len(sa) % n:
                raise ValueError(
                    f"mesh size {n} must divide both batch items "
                    f"({segs.shape[1]}) and items*K ({len(sa)})"
                )
        if probs is not None:
            a_full, b_full = self._get_augment(True)(
                jnp.asarray(segs), jnp.asarray(keys),
                {k: jnp.float32(v) for k, v in probs.items()},
            )
        else:
            a_full, b_full = self._get_augment(False)(
                jnp.asarray(segs), jnp.asarray(keys)
            )
        fn = self._steps.get((la, lb))
        if fn is None:
            fn = self._steps[(la, lb)] = self._build_step(la, lb)
        return fn(state, a_full, b_full, jnp.asarray(sa), jnp.asarray(sb))


def make_fused_contrastive_step(
    encoder,
    tx: optax.GradientTransformation,
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    pad: int,
    la: int,
    lb: int,
    temperature: float = 0.1,
    axis_name: Optional[str] = None,
    compute_dtype: str = "float32",
) -> Callable:
    """Single-jit ``step(state, segs, keys, sa, sb) -> (state, loss)`` with
    augmentation fused in — for fixed ``(la, lb)`` shapes (benchmarks, the
    multi-chip dryrun). For training through the random-duration collate use
    :class:`FusedContrastivePipeline` (see module docstring)."""
    inner = make_contrastive_train_step(
        encoder, tx, temperature, axis_name=axis_name, compute_dtype=compute_dtype
    )

    def step(state: TrainState, segs, keys, sa, sb):
        a_full, b_full = augment_contrastive_views(
            manipulators, instruments, segs, keys, pad
        )
        return inner(
            state, crop_views(a_full, sa, la), crop_views(b_full, sb, lb)
        )

    return step


def make_sharded_fused_contrastive_step(
    encoder,
    tx: optax.GradientTransformation,
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    pad: int,
    la: int,
    lb: int,
    mesh: Mesh,
    temperature: float = 0.1,
    axis: str = "data",
    compute_dtype: str = "float32",
):
    """Mesh variant of :func:`make_fused_contrastive_step`: items (and their
    FX keys / crop starts) shard over ``axis``; per-shard augmentation is
    embarrassingly parallel, NT-Xent negatives ride ``all_gather`` inside
    the inner step."""
    step = make_fused_contrastive_step(
        encoder, tx, manipulators, instruments, pad, la, lb,
        temperature, axis_name=axis, compute_dtype=compute_dtype,
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # FX-chain scans inside the shard (see FusedContrastivePipeline)
        check_vma=False,
    )
    return jax.jit(sharded)


def augment_triplets(
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    segs: jnp.ndarray,  # [n_inst, items, 2(content A/B), 2(ch), L_load]
    keys: jnp.ndarray,  # [n_inst, items, 2] uint32
    pad: int,
    seg_len: int,
    fast: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device ``StyleTransferTripletDataset.sample_batch``: ONE FX draw
    per (inst, item) applied to both contents -> A2 (ground truth) and B2
    (reference); A1 is the raw input. Returns instrument-major stacks
    ``[n_inst*items, 2, seg_len]`` matching the legacy loop's concat order.
    ``fast``: batched stage-tree evaluation (fx/fastpath.py), with fallback.
    """
    x = _dequant(segs)
    sl = slice(pad, pad + seg_len)
    if fast:
        try:
            n_inst, B = x.shape[0], x.shape[1]
            man = eval_manipulators_batched(
                manipulators,
                instruments,
                keys.reshape(-1, 2),
                x.reshape((n_inst * B,) + x.shape[2:]),
                B,
            )  # [n_inst*B, 2, 2, L_load]
            a1 = jnp.clip(
                x.reshape((n_inst * B,) + x.shape[2:])[:, 0, :, sl], -1.0, 1.0
            )
            return (
                a1,
                jnp.clip(man[:, 0, :, sl], -1.0, 1.0),
                jnp.clip(man[:, 1, :, sl], -1.0, 1.0),
            )
        except UnsupportedTopology:
            pass
    a1s, a2s, b2s = [], [], []
    for i, inst in enumerate(instruments):
        man = jax.vmap(manipulators[inst], in_axes=(0, 0))(keys[i], x[i])
        a1s.append(jnp.clip(x[i][:, 0, :, sl], -1.0, 1.0))
        a2s.append(jnp.clip(man[:, 0, :, sl], -1.0, 1.0))
        b2s.append(jnp.clip(man[:, 1, :, sl], -1.0, 1.0))
    return (
        jnp.concatenate(a1s),
        jnp.concatenate(a2s),
        jnp.concatenate(b2s),
    )


def make_fused_converter_step(
    converter,
    encoder,
    tx: optax.GradientTransformation,
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    pad: int,
    seg_len: int,
    rms_weight: float = 0.1,
    axis_name: Optional[str] = None,
    compute_dtype: str = "float32",
    ori_weight: float = 0.0,
) -> Callable:
    """``step(state, enc_vars, segs, keys) -> (state, loss)``. The converter
    keeps FX probabilities fixed and its segment length static, so one jit
    serves the whole run."""
    inner = make_converter_train_step(
        converter, encoder, tx, rms_weight, axis_name=axis_name,
        compute_dtype=compute_dtype, ori_weight=ori_weight,
    )

    def step(state: TrainState, enc_vars, segs, keys):
        a1, a2, b2 = augment_triplets(
            manipulators, instruments, segs, keys, pad, seg_len
        )
        return inner(state, enc_vars, a1, a2, b2)

    return step


def make_fused_converter_loss(
    converter,
    encoder,
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    pad: int,
    seg_len: int,
    rms_weight: float = 0.1,
    compute_dtype: str = "float32",
    ori_weight: float = 0.0,
) -> Callable:
    """Loss-only twin of :func:`make_fused_converter_step` for held-out
    validation: ``loss(state, enc_vars, segs, keys) -> scalar`` (no update,
    BN updates discarded)."""
    from .converter import converter_loss_fn

    cdtype = jnp.dtype(compute_dtype)

    def lossf(state: TrainState, enc_vars, segs, keys):
        a1, a2, b2 = augment_triplets(
            manipulators, instruments, segs, keys, pad, seg_len
        )
        loss, _ = converter_loss_fn(
            converter, encoder, state.params, state.batch_stats, enc_vars,
            a1, a2, b2, rms_weight, cdtype, ori_weight,
        )
        return loss

    return lossf


def make_sharded_fused_converter_step(
    converter,
    encoder,
    tx: optax.GradientTransformation,
    manipulators: Dict[str, AugmentationChain],
    instruments: Sequence[str],
    pad: int,
    seg_len: int,
    mesh: Mesh,
    rms_weight: float = 0.1,
    axis: str = "data",
    compute_dtype: str = "float32",
    ori_weight: float = 0.0,
):
    step = make_fused_converter_step(
        converter, encoder, tx, manipulators, instruments, pad, seg_len,
        rms_weight, axis_name=axis, compute_dtype=compute_dtype,
        ori_weight=ori_weight,
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis)),
        out_specs=(P(), P()),
        # same FFT-transpose vma caveat as make_sharded_converter_step
        check_vma=False,
    )
    return jax.jit(sharded)

"""Full training loops: FXencoder (contrastive) and MixFXcloner (converter).

The reference repo ships datasets and losses but no trainer (SURVEY.md §3.4);
this module provides the complete TPU training stack around them:

- epoch loop over the MUSDB datasets with on-device FX manipulation
- FX apply-probability scheduling (the paper's "probability scheduling" —
  the published encoder checkpoint is named ``FXencoder_ps``): per-epoch
  interpolation from the initial probabilities toward a target, rebuilding
  the (jitted) manipulation chains when they change
- data-mesh sharding (shard_map), orbax checkpointing with retention,
  deterministic validation
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import FXencoderConfig, TCNConfig, TrainConfig
from ..data.datasets import ContrastivePairDataset, StyleTransferTripletDataset
from ..data.prefetch import BatchPrefetcher
from ..models import FXencoder
from ..parallel import create_mesh
from ..utils.logging import Timer, get_logger
from .checkpoint import CheckpointManager
from .contrastive import init_contrastive, make_contrastive_train_step, make_sharded_contrastive_step
from .converter import init_converter, make_converter_train_step, make_sharded_converter_step
from .fused import (
    FusedContrastivePipeline,
    make_fused_converter_step,
    make_sharded_fused_converter_step,
)
from .state import current_lr

log = get_logger("train")


def _log_metrics(out_dir: str, record: Dict) -> None:
    """Append one JSON line per epoch to <out_dir>/metrics.jsonl
    (observability the reference lacks entirely, SURVEY.md §5.5)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def schedule_probs(
    initial: Dict[str, float],
    target: Dict[str, float],
    epoch: int,
    total_epochs: int,
) -> Dict[str, float]:
    """Linear probability schedule from ``initial`` to ``target``."""
    t = min(epoch / max(total_epochs - 1, 1), 1.0)
    return {k: (1 - t) * initial[k] + t * target.get(k, initial[k]) for k in initial}


def train_fxencoder(
    data_dir: str,
    out_dir: str,
    encoder_cfg: Optional[FXencoderConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    epochs: int = 10,
    steps_per_epoch: int = 40,
    batch_items: int = 4,
    prob_schedule_target: Optional[Dict[str, float]] = None,
    use_mesh: bool = True,
    val_every: int = 1,
    keep_ckpts: int = 2,
    resume: bool = True,
    fused: bool = False,
    instruments=("drums", "bass", "other", "vocals"),
    collate_quantum: int = None,
):
    """Contrastive FXencoder training (SURVEY.md §3.4 step semantics).

    ``collate_quantum``: bucket size for the random-duration collate
    (default ``max(4096, L//8)`` -> up to ~16 (la, lb) shape pairs). Each
    new pair is one XLA compile of the full train step — minutes over the
    remote-compile tunnel — so slow-compile rigs can coarsen it (e.g.
    ``L//4`` -> 4 pairs) without touching crop-start randomness.

    ``fused=True`` routes augmentation through the device-resident
    :class:`FusedContrastivePipeline` (train/fused.py): the host ships raw
    int16 PCM + PRNG keys + the crop plan, and FX manipulation / cropping /
    the train step chain on device with no manipulated-audio round trip —
    numerics identical to the legacy path (tests/test_fused_train.py).
    """
    tcfg = train_cfg or TrainConfig()
    enc, state, tx = init_contrastive(encoder_cfg, tcfg, seed=tcfg.seed)

    mesh = create_mesh() if use_mesh and len(jax.devices()) > 1 else None
    pipeline = None
    if fused:
        pipeline = FusedContrastivePipeline(
            enc, tx, tcfg.temperature, mesh=mesh, compute_dtype=tcfg.compute_dtype
        )
        step_fn = None
    elif mesh is not None:
        step_fn = make_sharded_contrastive_step(
            enc, tx, mesh, tcfg.temperature, compute_dtype=tcfg.compute_dtype
        )
    else:
        step_fn = jax.jit(
            make_contrastive_train_step(
                enc, tx, tcfg.temperature, compute_dtype=tcfg.compute_dtype
            )
        )
    if mesh is not None:
        log.info("training on %d-device mesh", mesh.devices.size)

    mgr = CheckpointManager(os.path.join(out_dir, "ckpt"), keep=keep_ckpts)
    start_epoch = 0
    if resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        if mesh is not None:
            # orbax restores onto device 0; sharded steps need the state
            # replicated over the mesh (mixing committed placements errors)
            state = jax.device_put(state, NamedSharding(mesh, P()))
        start_epoch = int(mgr.latest_step())
        log.info("resumed from epoch %d", start_epoch)

    initial_probs = dict(tcfg.apply_prob)
    timer = Timer()
    for epoch in range(start_epoch, epochs):
        probs = (
            schedule_probs(initial_probs, prob_schedule_target, epoch, epochs)
            if prob_schedule_target
            else initial_probs
        )
        ds = ContrastivePairDataset(
            data_dir,
            mode="train",
            instruments=instruments,
            segment_length=tcfg.segment_length,
            num_strong_negatives=tcfg.num_strong_negatives,
            apply_prob_dict=probs,
            reverb_prob=dict(tcfg.reverb_prob),
        )
        rng = np.random.default_rng(tcfg.seed + epoch)
        losses = []

        if pipeline is not None:
            if pipeline._chains is None:
                # bind once: scheduled probabilities ride the SAME compiled
                # augmentation executable as traced scalars (fx/chain.py) —
                # per-epoch re-jits would cost minutes of compile each
                pipeline.set_chains(ds.manipulators, ds.instruments, ds.pad)
            dyn_probs = dict(probs) if prob_schedule_target else None
            K = tcfg.num_strong_negatives + 1

            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                segs, keys = ds.sample_raw_batch(idxs, epoch_seed=tcfg.seed + epoch)
                la, lb, sa, sb = ds.collate_plan(len(idxs) * K, rng, collate_quantum)
                return segs, keys, sa, sb, la, lb

            for segs, keys, sa, sb, la, lb in BatchPrefetcher(make_batch, steps_per_epoch):
                with timer.section("step"):
                    state, loss = pipeline.step(
                        state, segs, keys, sa, sb, la, lb, probs=dyn_probs
                    )
                    losses.append(loss)  # device array: defer sync
        else:
            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                a, b = ds.sample_batch(idxs, epoch_seed=tcfg.seed + epoch)
                return ds.collate_random_duration(a, b, rng, collate_quantum)

            for ca, cb in BatchPrefetcher(make_batch, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(state, jnp.asarray(ca), jnp.asarray(cb))
                    losses.append(loss)  # device array: defer sync; prefetch thread
                    # keeps the next batch's WAV IO off the critical path
        log.info(
            "epoch %d  probs=%s  loss=%.4f  (%s)",
            epoch,
            {k: round(v, 2) for k, v in probs.items()},
            float(np.mean([float(l) for l in losses])),
            timer.summary(),
        )
        _log_metrics(
            out_dir,
            {
                "model": "fxencoder",
                "epoch": epoch,
                "loss": float(np.mean([float(l) for l in losses])),
                "lr": current_lr(tcfg, int(state.step)),
                "probs": {k: round(v, 4) for k, v in probs.items()},
                "wall": {k: round(v, 2) for k, v in timer.totals.items()},
                "time": time.time(),
            },
        )
        mgr.save(epoch + 1, state)

    return state


def train_converter(
    data_dir: str,
    out_dir: str,
    encoder_variables: Dict,
    encoder_cfg: Optional[FXencoderConfig] = None,
    converter_cfg: Optional[TCNConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    epochs: int = 10,
    steps_per_epoch: int = 40,
    batch_items: int = 2,
    use_mesh: bool = True,
    keep_ckpts: int = 2,
    resume: bool = True,
    fused: bool = False,
    instruments=("drums", "bass", "other", "vocals"),
):
    """Converter training with a frozen pretrained encoder (SURVEY.md §3.5).

    ``fused=True``: FX manipulation runs inside the (single) jitted step —
    the host ships raw int16 PCM + keys, nothing manipulated ever crosses
    the link (train/fused.py; the converter's probabilities and segment
    length are fixed, so one executable serves the whole run)."""
    tcfg = train_cfg or TrainConfig()
    enc_model = FXencoder(config=encoder_cfg or FXencoderConfig())
    conv, state, tx = init_converter(converter_cfg, tcfg, seed=tcfg.seed)

    mesh = create_mesh() if use_mesh and len(jax.devices()) > 1 else None

    mgr = CheckpointManager(os.path.join(out_dir, "ckpt_conv"), keep=keep_ckpts)
    start_epoch = 0
    if resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        start_epoch = int(mgr.latest_step())
        log.info("resumed from epoch %d", start_epoch)

    ds = StyleTransferTripletDataset(
        data_dir,
        mode="train",
        instruments=instruments,
        segment_length=tcfg.segment_length,
        apply_prob_dict=dict(tcfg.apply_prob),  # converter keeps probs fixed
        reverb_prob=dict(tcfg.reverb_prob),
    )
    if fused and mesh is not None:
        step_fn = make_sharded_fused_converter_step(
            conv, enc_model, tx, ds.manipulators, ds.instruments, ds.pad,
            tcfg.segment_length, mesh, compute_dtype=tcfg.compute_dtype,
        )
    elif fused:
        step_fn = jax.jit(make_fused_converter_step(
            conv, enc_model, tx, ds.manipulators, ds.instruments, ds.pad,
            tcfg.segment_length, compute_dtype=tcfg.compute_dtype,
        ))
    elif mesh is not None:
        step_fn = make_sharded_converter_step(
            conv, enc_model, tx, mesh, compute_dtype=tcfg.compute_dtype
        )
    else:
        step_fn = jax.jit(
            make_converter_train_step(conv, enc_model, tx, compute_dtype=tcfg.compute_dtype)
        )

    timer = Timer()
    for epoch in range(start_epoch, epochs):
        losses = []

        if fused:
            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                return ds.sample_raw_batch(idxs, epoch_seed=tcfg.seed + epoch)

            for segs, keys in BatchPrefetcher(make_batch, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(
                        state, encoder_variables,
                        jnp.asarray(segs), jnp.asarray(keys),
                    )
                    losses.append(loss)  # defer sync (see contrastive loop)
        else:
            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                batch = ds.sample_batch(idxs, epoch_seed=tcfg.seed + epoch)
                # stack instruments into the batch axis
                a1 = np.concatenate([batch[i]["a1"] for i in ds.instruments])
                a2 = np.concatenate([batch[i]["a2"] for i in ds.instruments])
                b2 = np.concatenate([batch[i]["b2"] for i in ds.instruments])
                return a1, a2, b2

            for a1, a2, b2 in BatchPrefetcher(make_batch, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(
                        state, encoder_variables,
                        jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b2),
                    )
                    losses.append(loss)  # defer sync (see contrastive loop)
        log.info("epoch %d  loss=%.4f  (%s)", epoch, float(np.mean([float(l) for l in losses])), timer.summary())
        _log_metrics(
            out_dir,
            {
                "model": "converter",
                "epoch": epoch,
                "loss": float(np.mean([float(l) for l in losses])),
                "lr": current_lr(tcfg, int(state.step)),
                "wall": {k: round(v, 2) for k, v in timer.totals.items()},
                "time": time.time(),
            },
        )
        mgr.save(epoch + 1, state)

    return state

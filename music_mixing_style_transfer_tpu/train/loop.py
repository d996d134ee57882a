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

import gc
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
    make_fused_converter_loss,
    make_fused_converter_step,
    make_sharded_fused_converter_step,
)
from .state import current_lr

log = get_logger("train")


def _val_mode(data_dir: str) -> Optional[str]:
    """Held-out split directory name ('val' preferred, else 'test')."""
    for mode in ("val", "test"):
        if os.path.isdir(os.path.join(data_dir, mode)):
            return mode
    return None


class _TimedBatches:
    """Wrap ``make_batch`` to accumulate host batch-production seconds
    (runs on the prefetch thread; single writer, read at epoch end)."""

    def __init__(self, make_batch):
        self._make = make_batch
        self.seconds = 0.0

    def __call__(self, i):
        t0 = time.perf_counter()
        out = self._make(i)
        self.seconds += time.perf_counter() - t0
        return out


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
    save_every: int = 1,
    val_items: int = 2,
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

    ``save_every``: checkpoint every N epochs (orbax pulls the full
    f32 state D2H — ~10-40 s over the serving tunnel, so per-epoch saves
    can dominate short fast epochs). The final epoch always saves.

    ``val_every``/``val_items``: every N epochs, a deterministic held-out
    loss over ``val_items`` items from the corpus' val (or test) split at
    END-of-schedule probabilities — fixed seeds and fixed probs make the
    series comparable across epochs (reference val semantics,
    ``data_loader.py:202-220``). Logged as ``val_loss`` in metrics.jsonl.
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
    final_probs = {
        k: (prob_schedule_target or {}).get(k, v) for k, v in initial_probs.items()
    }

    # held-out validation: deterministic seeds + END-of-schedule probs
    val_mode = _val_mode(data_dir) if val_every else None
    ds_val = val_jit = None
    if val_mode is not None:
        from .contrastive import contrastive_loss_fn

        try:
            ds_val = ContrastivePairDataset(
                data_dir,
                mode=val_mode,
                instruments=instruments,
                segment_length=tcfg.segment_length,
                num_strong_negatives=tcfg.num_strong_negatives,
                apply_prob_dict=final_probs,
                reverb_prob=dict(tcfg.reverb_prob),
            )
        except FileNotFoundError as e:
            log.warning("no usable %s split for validation (%s)", val_mode, e)
        else:
            val_jit = jax.jit(
                lambda st, a, b: contrastive_loss_fn(
                    enc, st.params, st.batch_stats, a, b, tcfg.temperature,
                    None, jnp.dtype(tcfg.compute_dtype),
                )[0]
            )

    def compute_val(st) -> float:
        a, b = ds_val.sample_batch(list(range(val_items)))
        ca = np.stack([a[i] for i in instruments])
        cb = np.stack([b[i] for i in instruments])
        return float(val_jit(st, jnp.asarray(ca), jnp.asarray(cb)))

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
        timer = Timer()  # per-epoch (NOT cumulative) wall sections
        epoch_t0 = time.perf_counter()
        synced_step_s = None

        if pipeline is not None:
            if pipeline._chains is None:
                # bind once: scheduled probabilities ride the SAME compiled
                # augmentation executable as traced scalars (fx/chain.py) —
                # per-epoch re-jits would cost minutes of compile each
                pipeline.set_chains(ds.manipulators, ds.instruments, ds.pad)
            dyn_probs = dict(probs) if prob_schedule_target else None
            K = tcfg.num_strong_negatives + 1
            # whole epoch's FX keys in ONE device dispatch: per-batch key
            # splits queue behind in-flight augment/train work on the chip
            # and serialize the input pipeline (datasets.batch_keys)
            epoch_keys = ds.batch_keys(
                list(range(steps_per_epoch * batch_items)),
                epoch_seed=tcfg.seed + epoch,
            )

            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                segs, keys = ds.sample_raw_batch(
                    idxs,
                    epoch_seed=tcfg.seed + epoch,
                    keys=epoch_keys[:, step * batch_items : (step + 1) * batch_items],
                )
                la, lb, sa, sb = ds.collate_plan(len(idxs) * K, rng, collate_quantum)
                return segs, keys, sa, sb, la, lb

            timed = _TimedBatches(make_batch)
            for segs, keys, sa, sb, la, lb in BatchPrefetcher(timed, steps_per_epoch):
                with timer.section("step"):
                    state, loss = pipeline.step(
                        state, segs, keys, sa, sb, la, lb, probs=dyn_probs
                    )
                    losses.append(loss)  # device array: defer sync
                if synced_step_s is None:
                    # one BLOCKED step per epoch: float() forces the full
                    # augment+step chain, giving a true compute wall next to
                    # the async dispatch times (the "step" section measures
                    # upload+dispatch only — see TRAIN_BENCH.json note)
                    t0 = time.perf_counter()
                    float(loss)
                    synced_step_s = (
                        timer.totals["step"] + time.perf_counter() - t0
                    )
        else:
            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                a, b = ds.sample_batch(idxs, epoch_seed=tcfg.seed + epoch)
                return ds.collate_random_duration(a, b, rng, collate_quantum)

            timed = _TimedBatches(make_batch)
            for ca, cb in BatchPrefetcher(timed, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(state, jnp.asarray(ca), jnp.asarray(cb))
                    losses.append(loss)  # device array: defer sync; prefetch thread
                    # keeps the next batch's WAV IO off the critical path
                if synced_step_s is None:
                    t0 = time.perf_counter()
                    float(loss)
                    synced_step_s = (
                        timer.totals["step"] + time.perf_counter() - t0
                    )

        # one stacked D2H fetch (per-scalar float() pays a tunnel RTT each)
        epoch_loss = float(jnp.mean(jnp.stack(losses)))
        val_loss = (
            compute_val(state)
            if ds_val is not None and (epoch + 1) % max(val_every, 1) == 0
            else None
        )
        wall = {k: round(v, 2) for k, v in timer.totals.items()}
        wall["host"] = round(timed.seconds, 2)
        wall["epoch"] = round(time.perf_counter() - epoch_t0, 2)
        if synced_step_s is not None:
            wall["synced_step"] = round(synced_step_s, 3)
        log.info(
            "epoch %d  probs=%s  loss=%.4f%s  (%s)",
            epoch,
            {k: round(v, 2) for k, v in probs.items()},
            epoch_loss,
            "" if val_loss is None else f"  val={val_loss:.4f}",
            "  ".join(f"{k}={v}s" for k, v in wall.items()),
        )
        record = {
            "model": "fxencoder",
            "epoch": epoch,
            "loss": epoch_loss,
            "lr": current_lr(tcfg, int(state.step)),
            "probs": {k: round(v, 4) for k, v in probs.items()},
            "wall": wall,
            "time": time.time(),
        }
        if val_loss is not None:
            record["val_loss"] = val_loss
        _log_metrics(out_dir, record)
        if (epoch + 1) % max(save_every, 1) == 0 or epoch == epochs - 1:
            mgr.save(epoch + 1, state)
        # drop dead per-step host references promptly: long runs over the
        # remote-transfer backend otherwise accumulate staging buffers
        # (observed ~GB/min of host RSS on the serving tunnel; the outer
        # train CLI additionally survives a hard OOM kill via resume)
        gc.collect()

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
    save_every: int = 1,
    val_every: int = 1,
    val_items: int = 2,
    ori_weight: float = 0.0,
):
    """Converter training with a frozen pretrained encoder (SURVEY.md §3.5).

    ``fused=True``: FX manipulation runs inside the (single) jitted step —
    the host ships raw int16 PCM + keys, nothing manipulated ever crosses
    the link (train/fused.py; the converter's probabilities and segment
    length are fixed, so one executable serves the whole run).

    ``save_every``/``val_every``/``val_items``: as in
    :func:`train_fxencoder` — checkpoint cadence and a deterministic
    held-out spectral-loss series (``val_loss`` in metrics.jsonl).

    ``ori_weight``: weight of the reference's ``mode='ori'`` per-channel
    L/R spectral term added to the mid/side loss (train/converter.py) —
    the mid/side magnitudes alone are blind to a static channel imbalance."""
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
            ori_weight=ori_weight,
        )
    elif fused:
        step_fn = jax.jit(make_fused_converter_step(
            conv, enc_model, tx, ds.manipulators, ds.instruments, ds.pad,
            tcfg.segment_length, compute_dtype=tcfg.compute_dtype,
            ori_weight=ori_weight,
        ))
    elif mesh is not None:
        step_fn = make_sharded_converter_step(
            conv, enc_model, tx, mesh, compute_dtype=tcfg.compute_dtype,
            ori_weight=ori_weight,
        )
    else:
        step_fn = jax.jit(
            make_converter_train_step(
                conv, enc_model, tx, compute_dtype=tcfg.compute_dtype,
                ori_weight=ori_weight,
            )
        )

    # held-out validation: deterministic triplets + frozen-encoder loss
    val_mode = _val_mode(data_dir) if val_every else None
    ds_val = val_jit = None
    if val_mode is not None:
        from .converter import converter_loss_fn

        try:
            ds_val = StyleTransferTripletDataset(
                data_dir,
                mode=val_mode,
                instruments=instruments,
                segment_length=tcfg.segment_length,
                apply_prob_dict=dict(tcfg.apply_prob),
                reverb_prob=dict(tcfg.reverb_prob),
            )
        except FileNotFoundError as e:
            log.warning("no usable %s split for validation (%s)", val_mode, e)
        else:
            val_jit = jax.jit(
                lambda st, ev, a1, a2, b2: converter_loss_fn(
                    conv, enc_model, st.params, st.batch_stats, ev,
                    a1, a2, b2, compute_dtype=jnp.dtype(tcfg.compute_dtype),
                    ori_weight=ori_weight,
                )[0]
            )

    def compute_val(st) -> float:
        batch = ds_val.sample_batch(list(range(val_items)))
        a1 = np.concatenate([batch[i]["a1"] for i in ds_val.instruments])
        a2 = np.concatenate([batch[i]["a2"] for i in ds_val.instruments])
        b2 = np.concatenate([batch[i]["b2"] for i in ds_val.instruments])
        return float(
            val_jit(st, encoder_variables, jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b2))
        )

    for epoch in range(start_epoch, epochs):
        losses = []
        timer = Timer()  # per-epoch (NOT cumulative) wall sections
        epoch_t0 = time.perf_counter()
        synced_step_s = None

        if fused:
            # one key dispatch per epoch (see the contrastive loop)
            epoch_keys = ds.batch_keys(
                list(range(steps_per_epoch * batch_items)),
                epoch_seed=tcfg.seed + epoch,
            )

            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                return ds.sample_raw_batch(
                    idxs,
                    epoch_seed=tcfg.seed + epoch,
                    keys=epoch_keys[:, step * batch_items : (step + 1) * batch_items],
                )

            timed = _TimedBatches(make_batch)
            for segs, keys in BatchPrefetcher(timed, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(
                        state, encoder_variables,
                        jnp.asarray(segs), jnp.asarray(keys),
                    )
                    losses.append(loss)  # defer sync (see contrastive loop)
                if synced_step_s is None:
                    t0 = time.perf_counter()
                    float(loss)  # one blocked step per epoch: true compute wall
                    synced_step_s = timer.totals["step"] + time.perf_counter() - t0
        else:
            def make_batch(step):
                idxs = list(range(step * batch_items, (step + 1) * batch_items))
                batch = ds.sample_batch(idxs, epoch_seed=tcfg.seed + epoch)
                # stack instruments into the batch axis
                a1 = np.concatenate([batch[i]["a1"] for i in ds.instruments])
                a2 = np.concatenate([batch[i]["a2"] for i in ds.instruments])
                b2 = np.concatenate([batch[i]["b2"] for i in ds.instruments])
                return a1, a2, b2

            timed = _TimedBatches(make_batch)
            for a1, a2, b2 in BatchPrefetcher(timed, steps_per_epoch):
                with timer.section("step"):
                    state, loss = step_fn(
                        state, encoder_variables,
                        jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b2),
                    )
                    losses.append(loss)  # defer sync (see contrastive loop)
                if synced_step_s is None:
                    t0 = time.perf_counter()
                    float(loss)
                    synced_step_s = timer.totals["step"] + time.perf_counter() - t0

        # one stacked D2H fetch (per-scalar float() pays a tunnel RTT each)
        epoch_loss = float(jnp.mean(jnp.stack(losses)))
        val_loss = (
            compute_val(state)
            if ds_val is not None and (epoch + 1) % max(val_every, 1) == 0
            else None
        )
        wall = {k: round(v, 2) for k, v in timer.totals.items()}
        wall["host"] = round(timed.seconds, 2)
        wall["epoch"] = round(time.perf_counter() - epoch_t0, 2)
        if synced_step_s is not None:
            wall["synced_step"] = round(synced_step_s, 3)
        log.info(
            "epoch %d  loss=%.4f%s  (%s)",
            epoch,
            epoch_loss,
            "" if val_loss is None else f"  val={val_loss:.4f}",
            "  ".join(f"{k}={v}s" for k, v in wall.items()),
        )
        record = {
            "model": "converter",
            "epoch": epoch,
            "loss": epoch_loss,
            "lr": current_lr(tcfg, int(state.step)),
            "wall": wall,
            "time": time.time(),
        }
        if val_loss is not None:
            record["val_loss"] = val_loss
        _log_metrics(out_dir, record)
        if (epoch + 1) % max(save_every, 1) == 0 or epoch == epochs - 1:
            mgr.save(epoch + 1, state)
        # drop dead per-step host references promptly: long runs over the
        # remote-transfer backend otherwise accumulate staging buffers
        # (observed ~GB/min of host RSS on the serving tunnel; the outer
        # train CLI additionally survives a hard OOM kill via resume)
        gc.collect()

    return state

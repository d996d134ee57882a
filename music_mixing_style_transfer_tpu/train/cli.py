"""Training CLI.

Usage:
    python -m music_mixing_style_transfer_tpu.train.cli fxencoder \
        --data_dir /data/musdb_normalized --out_dir runs/enc --epochs 100
    python -m music_mixing_style_transfer_tpu.train.cli converter \
        --data_dir /data/musdb_normalized --out_dir runs/conv \
        --encoder_ckpt runs/enc/ckpt
"""
from __future__ import annotations

import argparse
import os
import sys

from ..config import TrainConfig
from .loop import train_converter, train_fxencoder

_RETRY_ENV = "MST_TRAIN_RETRY"  # attempts consumed so far (re-exec counter)


def _is_transient(exc: Exception) -> bool:
    """Infrastructure failure we may retry (never a real training error)."""
    try:
        import jax

        is_runtime = isinstance(exc, jax.errors.JaxRuntimeError)
    except (ImportError, AttributeError):  # pragma: no cover - old jaxlib
        is_runtime = type(exc).__name__ in ("JaxRuntimeError", "XlaRuntimeError")
    msg = str(exc)
    return is_runtime and (
        "INTERNAL" in msg or "UNAVAILABLE" in msg or "remote_compile" in msg
    )


def _maybe_reexec_on_transient(exc: Exception, max_retries: int, argv=None) -> None:
    """Re-exec the training process on *transient* backend failures.

    On shared/preempted TPU fleets the runtime can die mid-run with an
    INTERNAL error (compile-service connection dropped, backend preempted);
    the in-process JAX client is not trustworthy after that, so recovery is
    a fresh process — ``train_fxencoder``/``train_converter`` resume from
    the latest orbax checkpoint, losing at most the in-flight epoch
    (SURVEY.md §5.3; resume semantics tests/test_train_loop.py). Anything
    that isn't an infrastructure error re-raises: a genuine NaN/shape bug
    must fail loudly, not loop.

    ``argv``: the EFFECTIVE argument list ``main`` ran with — programmatic
    callers are restarted with their own arguments, not the process's."""
    if not _is_transient(exc):
        raise exc
    used = int(os.environ.get(_RETRY_ENV, "0"))
    if used >= max_retries:
        raise exc
    os.environ[_RETRY_ENV] = str(used + 1)
    sys.stderr.write(
        f"[train.cli] transient backend failure (attempt {used + 1}/"
        f"{max_retries}): {str(exc).splitlines()[0]}\n[train.cli] re-exec + "
        "checkpoint resume\n"
    )
    sys.stderr.flush()
    effective = list(argv) if argv is not None else sys.argv[1:]
    os.execv(sys.executable, [sys.executable, "-m", __spec__.name] + effective)


def main(argv=None) -> int:
    import jax

    from music_mixing_style_transfer_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", choices=["fxencoder", "converter"])
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--steps_per_epoch", type=int, default=40)
    p.add_argument("--batch_items", type=int, default=4)
    p.add_argument("--segment_length", type=int, default=2**17)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "warmup_cosine", "step"],
                   help="LR schedule; state rides the optimizer step counter "
                        "so checkpoint resume continues mid-schedule")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_decay_steps", type=int, default=10_000,
                   help="(warmup_cosine) total decay horizon in steps")
    p.add_argument("--lr_end_factor", type=float, default=0.0,
                   help="(warmup_cosine) final LR as a fraction of peak")
    p.add_argument("--lr_step_size", type=int, default=1_000,
                   help="(step) steps between decays")
    p.add_argument("--lr_gamma", type=float, default=0.5,
                   help="(step) decay factor")
    p.add_argument("--collate_quantum", type=int, default=None,
                   help="(fxencoder) random-duration collate bucket size; "
                        "each distinct (la, lb) bucket pair is one train-step "
                        "compile — coarsen (e.g. segment_length//4) on "
                        "slow-compile rigs")
    p.add_argument("--num_strong_negatives", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_mesh", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="run FX augmentation on device inside the training "
                        "dispatch chain (raw int16 PCM up, scalar loss back; "
                        "~8x less link traffic, identical numerics). With a "
                        "mesh, batch_items must be divisible by its size.")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (params/optimizer/losses stay f32)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conv blocks on backward: O(1-block) "
                        "activation HBM for longer segments / bigger batches")
    p.add_argument("--encoder_ckpt", type=str, default=None,
                   help="(converter) orbax dir or torch .pt of the frozen encoder")
    p.add_argument("--prob_schedule", type=str, default=None,
                   help="(fxencoder) target probs, e.g. 'eq=0.5,comp=0.5'")
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every N epochs (orbax pulls the full "
                        "state D2H — ~10-40 s over the serving tunnel; raise "
                        "for fast epochs). The final epoch always saves.")
    p.add_argument("--val_every", type=int, default=1,
                   help="held-out val loss every N epochs (0 disables); "
                        "deterministic seeds + end-of-schedule probs, logged "
                        "as val_loss in metrics.jsonl")
    p.add_argument("--val_items", type=int, default=2,
                   help="items per held-out validation batch")
    p.add_argument("--ori_weight", type=float, default=0.0,
                   help="(converter) weight of the reference's mode='ori' "
                        "per-channel L/R spectral term added to the mid/side "
                        "loss; the mid/side magnitudes alone cannot see a "
                        "static channel imbalance (panning collapse)")
    p.add_argument("--retries", type=int, default=0,
                   help="re-exec + checkpoint-resume this many times on "
                        "TRANSIENT backend failures (INTERNAL/UNAVAILABLE: "
                        "compile-service drop, preemption); real training "
                        "errors still fail immediately")
    args = p.parse_args(argv)

    # fail fast: a missing corpus must not cost a full-size model compile
    # (dataset discovery otherwise runs only after init_contrastive)
    if not os.path.isdir(args.data_dir):
        p.error(f"--data_dir {args.data_dir}: not a directory")

    tcfg = TrainConfig(
        segment_length=args.segment_length,
        learning_rate=args.learning_rate,
        lr_schedule=args.lr_schedule,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_decay_steps=args.lr_decay_steps,
        lr_end_factor=args.lr_end_factor,
        lr_step_size=args.lr_step_size,
        lr_gamma=args.lr_gamma,
        num_strong_negatives=args.num_strong_negatives,
        temperature=args.temperature,
        seed=args.seed,
        compute_dtype=args.dtype,
        remat=args.remat,
    )

    try:
        if args.model == "fxencoder":
            target = None
            if args.prob_schedule:
                target = dict(
                    (k, float(v)) for k, v in
                    (kv.split("=") for kv in args.prob_schedule.split(","))
                )
            train_fxencoder(
                args.data_dir,
                args.out_dir,
                train_cfg=tcfg,
                epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch,
                batch_items=args.batch_items,
                prob_schedule_target=target,
                use_mesh=not args.no_mesh,
                fused=args.fused,
                collate_quantum=args.collate_quantum,
                save_every=args.save_every,
                val_every=args.val_every,
                val_items=args.val_items,
            )
        else:
            if args.encoder_ckpt is None:
                p.error("converter training requires --encoder_ckpt")
            from ..models.checkpoints import load_model_variables

            enc_vars = load_model_variables(args.encoder_ckpt, "fxencoder")
            train_converter(
                args.data_dir,
                args.out_dir,
                enc_vars,
                train_cfg=tcfg,
                epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch,
                batch_items=args.batch_items,
                use_mesh=not args.no_mesh,
                fused=args.fused,
                save_every=args.save_every,
                val_every=args.val_every,
                val_items=args.val_items,
                ori_weight=args.ori_weight,
            )
    except Exception as e:  # noqa: BLE001 — filtered in the handler
        _maybe_reexec_on_transient(e, args.retries, argv)
        raise
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training-step throughput benchmark.

Times the two production training steps at reference shapes
(SURVEY.md §3.4/§3.5; the reference repo never shipped a trainer, so these
are the numbers its training loop *would* be bounded by):

- **contrastive** (FXencoder, NT-Xent): per-instrument A/B views,
  ``[n_inst, B, 2, T]`` with ``B = batch_size_per_device * (1 + strong
  negatives)`` and ``T = segment_length`` (2^17 @ 44.1 kHz ~ 3 s).
- **converter** (MixFXcloner w/ frozen encoder): (A1, A2, B2) triplets
  ``[B, 2, T]``.

Reports steps/s and training audio-seconds/s (sum of all waveform samples a
step consumes). Timing follows the axon rules: N dispatches, ONE device
sync at the end (a per-step sync would add ~40 ms of tunnel round trip).

Run: ``python -m music_mixing_style_transfer_tpu.tools.train_bench
[--steps 10] [--dtype float32|bfloat16] [--batch 4] [--length 131072]``
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

SR = 44100


def _model_cfgs(args):
    """Production model configs, or shrunken ones under ``--tiny`` (CPU
    smoke testing: the real 81M-param encoder backward is impractical on a
    1-core host)."""
    from ..config import FXencoderConfig, TCNConfig

    if not args.tiny:
        return None, None
    enc = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
    )
    tcn = TCNConfig(
        condition_dimension=enc.embed_dim, nblocks=2, channel_width=8, kernel_size=7
    )
    return enc, tcn


def bench_contrastive(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..config import TrainConfig
    from ..train import init_contrastive, make_contrastive_train_step

    tcfg = TrainConfig(
        batch_size_per_device=args.batch, compute_dtype=args.dtype,
        remat=args.remat,
    )
    B = args.batch * (1 + tcfg.num_strong_negatives)
    T = args.length
    n_inst = 4

    enc_cfg, _ = _model_cfgs(args)
    enc, state, tx = init_contrastive(config=enc_cfg, train_cfg=tcfg)
    step = jax.jit(
        make_contrastive_train_step(
            enc, tx, temperature=tcfg.temperature, compute_dtype=args.dtype
        )
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n_inst, B, 2, T)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((n_inst, B, 2, T)).astype(np.float32) * 0.1)

    state, loss = step(state, a, b)  # compile
    assert bool(jnp.isfinite(loss)), "non-finite contrastive loss"

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, a, b)
    _ = float(loss)  # one sync
    dt = (time.perf_counter() - t0) / args.steps
    return {
        "contrastive_step_s": round(dt, 4),
        "contrastive_steps_per_s": round(1.0 / dt, 2),
        "contrastive_audio_s_per_s": round(n_inst * B * 2 * T / SR / dt, 1),
    }


def bench_converter(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..config import TrainConfig
    from ..train import init_contrastive, init_converter, make_converter_train_step

    tcfg = TrainConfig(
        batch_size_per_device=args.batch, compute_dtype=args.dtype,
        remat=args.remat,
    )
    B = args.batch * 2
    T = args.length

    enc_cfg, tcn_cfg = _model_cfgs(args)
    # frozen encoder: EVAL-mode module (running BN stats, immutable), as the
    # production converter loop builds it (train/loop.py:163)
    _, estate, _ = init_contrastive(config=enc_cfg, train_cfg=tcfg)
    enc_vars = {"params": estate.params, "batch_stats": estate.batch_stats}
    from ..config import FXencoderConfig
    from ..models import FXencoder

    enc = FXencoder(config=enc_cfg or FXencoderConfig())
    conv, state, tx = init_converter(config=tcn_cfg, train_cfg=tcfg)
    step = jax.jit(
        make_converter_train_step(conv, enc, tx, compute_dtype=args.dtype)
    )

    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(rng.standard_normal((B, 2, T)).astype(np.float32) * 0.1)
    a1, a2, b2 = mk(), mk(), mk()

    state, loss = step(state, enc_vars, a1, a2, b2)  # compile
    assert bool(jnp.isfinite(loss)), "non-finite converter loss"

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, enc_vars, a1, a2, b2)
    _ = float(loss)  # one sync
    dt = (time.perf_counter() - t0) / args.steps
    return {
        "converter_step_s": round(dt, 4),
        "converter_steps_per_s": round(1.0 / dt, 2),
        "converter_audio_s_per_s": round(3 * B * T / SR / dt, 1),
    }


def main(argv=None) -> int:
    import jax

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=4, help="batch_size_per_device")
    p.add_argument("--length", type=int, default=2**17, help="segment length (samples)")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--skip_contrastive", action="store_true")
    p.add_argument("--skip_converter", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialized blocks (memory-bound configs)")
    p.add_argument("--tiny", action="store_true",
                   help="shrunken model configs (CPU smoke testing only)")
    args = p.parse_args(argv)

    out = {"backend": jax.default_backend(), "dtype": args.dtype,
           "batch": args.batch, "length": args.length}
    if not args.skip_contrastive:
        out.update(bench_contrastive(args))
    if not args.skip_converter:
        out.update(bench_converter(args))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

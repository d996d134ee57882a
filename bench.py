"""Benchmark: whole-song mixing-style-transfer throughput on one chip.

Measures the production inference path (reference ``style_transfer.py:112-177``
semantics): FXencoder over the reference song's segments + MixFXcloner over
every input segment, at the reference's production shapes
(segment_length = 2^19 samples @ 44.1 kHz stereo).

Prints ONE JSON line:
  {"metric": "style_transfer_rtf", "value": <audio-seconds processed per
   wall-second per chip>, "unit": "x_realtime", "vs_baseline": value/50}
(baseline: the north-star RTF >= 50x from BASELINE.md.)
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16, help="segments per forward")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--seconds", type=float, default=None, help="ignored; for compat")
    args = p.parse_args()

    import jax

    from music_mixing_style_transfer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
    from music_mixing_style_transfer_tpu.models import FXencoder, MixFXcloner
    from music_mixing_style_transfer_tpu.models.fast_init import fast_init

    SEG = 2**19  # reference production segment length (style_transfer.py:362)
    SR = 44100
    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    enc = FXencoder()
    tcn = MixFXcloner()
    ev = fast_init(enc, jnp.zeros((1, 2, 2**14)))
    cv = fast_init(tcn, jnp.zeros((1, 2, 2**14)), jnp.zeros((1, 2048)))
    if dtype != jnp.float32:
        ev = jax.tree.map(lambda a: a.astype(dtype), ev)
        cv = jax.tree.map(lambda a: a.astype(dtype), cv)

    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.standard_normal((B, 2, SEG)).astype(np.float32) * 0.1)
    x_ref = jnp.asarray(rng.standard_normal((B, 2, SEG)).astype(np.float32) * 0.1)

    @jax.jit
    def style_transfer_step(ev, cv, x_ref, x_in):
        # reference-style: mean embedding over reference segments, then
        # convert every input segment conditioned on it
        emb = enc.apply(ev, x_ref.astype(dtype)).astype(jnp.float32)
        emb = jnp.mean(emb, axis=0)
        cond = jnp.broadcast_to(emb[None].astype(dtype), (x_in.shape[0], emb.shape[0]))
        return tcn.apply(cv, x_in.astype(dtype), cond)

    # warm up / compile + sanity: the computation must be finite
    out = style_transfer_step(ev, cv, x_ref, x_in)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), "non-finite output"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = style_transfer_step(ev, cv, x_ref, x_in)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # device sync
    dt = (time.perf_counter() - t0) / args.iters

    audio_seconds = B * SEG / SR  # input audio converted per call
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "style_transfer_rtf",
                "value": round(rtf, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 50.0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

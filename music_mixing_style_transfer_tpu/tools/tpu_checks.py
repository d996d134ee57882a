"""On-device acceptance checks — run on the real TPU chip.

Three checks the CPU test suite cannot cover (tests force a virtual CPU
mesh; Mosaic kernels only exercise their real DMA/layout behaviour
on-device):

1. **Fused Pallas TCN block vs the XLA path** at production shapes, per
   dilation — the fused kernel (``ops/pallas/tcn_block.py``) must match the
   unfused conv+epilogue math.
2. **Full MixFXcloner fused="on" vs fused="off"** — end-to-end waveform
   equivalence of the kernel-accelerated model.
3. **bf16 vs f32 fidelity** at production shapes on real sample audio:
   FXencoder embedding cosine and MixFXcloner waveform NRMSE — pins the
   margin the serving default (bf16) actually has against the >= 0.999
   north-star (BASELINE.md).

Writes ``TPU_CHECKS.json`` at the repo root and prints one summary line per
check.

    python -m music_mixing_style_transfer_tpu.tools.tpu_checks [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

SEG = 2**19  # production segment length (reference style_transfer.py:362)


def _sync(x) -> float:
    """Device sync via scalar readback (block_until_ready is a no-op on the
    axon tunnel platform)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _load_sample_segments(n: int, length: int) -> np.ndarray:
    """Real music segments from the reference's shipped samples when
    available, deterministic noise otherwise."""
    path = "/root/reference/samples/style_transfer/#0/separated/mdx_extra/input"
    segs = []
    if os.path.isdir(path):
        from ..data.wavio import read_wav_stereo_ct

        for inst in ("drums", "bass", "other", "vocals"):
            x = read_wav_stereo_ct(os.path.join(path, inst + ".wav"))
            T = x.shape[1]
            reps = int(np.ceil(n / 4 * length / max(T, 1))) + 1
            tiled = np.tile(x, (1, reps))
            for i in range(max(1, n // 4)):
                segs.append(tiled[:, i * length : (i + 1) * length])
    rng = np.random.default_rng(0)
    while len(segs) < n:
        segs.append((rng.standard_normal((2, length)) * 0.1).astype(np.float32))
    return np.stack(segs[:n]).astype(np.float32)


def check_envelope_kernel() -> dict:
    """Pallas envelope kernel vs the exact scan, on-device, at whole-song
    length across slab boundaries (compressor + expander + identity lanes)."""
    import jax.numpy as jnp

    from ..ops.compressor import compressor_process
    from ..ops.pallas.envelope import compressor_pallas

    T = 300_000  # > one 2^17 slab at 8 lanes -> exercises the carried state
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((6, T)) * 0.4).astype(np.float32))
    th = jnp.asarray([-20.0, -25.0, -30.0, -18.0, -24.0, -20.0])
    at = jnp.asarray([10.0, 5.0, 2.0, 15.0, 10.0, 10.0])
    re = jnp.asarray([100.0, 60.0, 40.0, 200.0, 100.0, 100.0])
    ra = jnp.asarray([3.0, 4.0, 2.0, 0.5, 0.25, 1.0])  # comp, exp, identity

    y_k = compressor_pallas(x, th, at, re, ra)
    y_s = compressor_process(x, th[:, None], at, re, ra[:, None], 0.0)
    err = float(jnp.max(jnp.abs(y_k - y_s)))
    out = {"max_abs_err": err, "pass": err < 1e-4}
    print(f"envelope kernel vs scan: max_abs_err={err:.3e}", flush=True)
    return out


def check_fused_kernel_blocks() -> dict:
    """Fused Pallas block vs pure-XLA math, per production dilation."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.tcn_block import fused_block_applicable, fused_tcn_block

    B, T, C, K = 2, SEG, 128, 15
    rng = np.random.default_rng(1)
    results = {}
    for d in (8, 64, 512, 4096, 8192):
        assert fused_block_applicable(C, d, T)
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, C, C)).astype(np.float32) * 0.05, jnp.bfloat16)
        s = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
        t = jnp.asarray(rng.uniform(-0.2, 0.2, C).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)
        wr = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.5)

        fused = fused_tcn_block(x, w, s, t, r, b, wr, d)

        @jax.jit
        def xla_ref(x, w, s, t, r, b, wr, d=d):
            pad = (K - 1) * d // 2
            h = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16),
                jnp.transpose(w, (0, 1, 2)).astype(jnp.bfloat16),  # [K, Cin, Cout]
                window_strides=(1,),
                padding=[(pad, pad)],
                rhs_dilation=(d,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )
            h = h * s[None, None] + t[None, None]
            h = jnp.where(h >= 0, h, 0.01 * h)
            h = h * r[:, None, :] + b[:, None, :]
            return h + x.astype(jnp.float32) * wr[None, None]

        ref = xla_ref(x, w, s, t, r, b, wr)
        err = jnp.max(jnp.abs(fused.astype(jnp.float32) - ref))
        scale = jnp.max(jnp.abs(ref))
        rel = float(err) / max(float(scale), 1e-12)
        results[str(d)] = {"max_abs_err": float(err), "rel_err": rel}
        print(f"fused d={d}: max_abs_err={float(err):.3e} rel={rel:.3e}", flush=True)
    results["pass"] = all(v["rel_err"] < 2e-2 for v in results.values() if isinstance(v, dict))
    return results


def check_full_model_fused_vs_xla() -> dict:
    """Whole MixFXcloner: fused='on' vs fused='off' on identical weights."""
    import jax.numpy as jnp

    from ..models import MixFXcloner
    from ..models.fast_init import fast_init

    # _load_sample_segments returns channel-first [B, 2, T] — the model's input layout
    x = jnp.asarray(_load_sample_segments(2, SEG), jnp.bfloat16)
    cond = jnp.asarray(np.random.default_rng(2).standard_normal((2, 2048)).astype(np.float32), jnp.bfloat16)

    on = MixFXcloner(fused="on")
    off = MixFXcloner(fused="off")
    cv = fast_init(on, jnp.zeros((1, 2, 2**14)), jnp.zeros((1, 2048)))
    import jax

    cv = jax.tree.map(lambda a: a.astype(jnp.bfloat16), cv)
    y_on = jax.jit(lambda v, a, c: on.apply(v, a, c))(cv, x, cond)
    y_off = jax.jit(lambda v, a, c: off.apply(v, a, c))(cv, x, cond)
    diff = jnp.max(jnp.abs(y_on.astype(jnp.float32) - y_off.astype(jnp.float32)))
    nrmse = float(
        jnp.sqrt(jnp.mean((y_on.astype(jnp.float32) - y_off.astype(jnp.float32)) ** 2))
        / (jnp.sqrt(jnp.mean(y_off.astype(jnp.float32) ** 2)) + 1e-12)
    )
    out = {"max_abs_err": float(diff), "nrmse": nrmse, "pass": nrmse < 2e-2}
    print(f"full model fused vs xla: max_abs_err={float(diff):.3e} nrmse={nrmse:.3e}", flush=True)
    return out


def check_bf16_fidelity() -> dict:
    """bf16 vs f32 at production shapes on real sample audio."""
    import jax
    import jax.numpy as jnp

    from ..models import FXencoder, MixFXcloner
    from ..models.fast_init import fast_init

    x = _load_sample_segments(8, SEG)
    enc = FXencoder()
    ev = fast_init(enc, jnp.zeros((1, 2, 2**14)))

    e32 = np.asarray(jax.jit(enc.apply)(ev, jnp.asarray(x)))
    ev16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), ev)
    e16 = np.asarray(
        jax.jit(lambda v, a: enc.apply(v, a))(ev16, jnp.asarray(x, jnp.bfloat16))
    ).astype(np.float32)
    cos = np.sum(e32 * e16, -1) / np.maximum(
        np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1), 1e-12
    )

    tcn = MixFXcloner()
    cv = fast_init(tcn, jnp.zeros((1, 2, 2**14)), jnp.zeros((1, 2048)))
    cond = e32[:2]
    y32 = np.asarray(jax.jit(tcn.apply)(cv, jnp.asarray(x[:2]), jnp.asarray(cond)))
    cv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), cv)
    y16 = np.asarray(
        jax.jit(lambda v, a, c: tcn.apply(v, a, c))(
            cv16, jnp.asarray(x[:2], jnp.bfloat16), jnp.asarray(cond, jnp.bfloat16)
        )
    ).astype(np.float32)
    nrmse = float(np.sqrt(np.mean((y32 - y16) ** 2)) / (np.sqrt(np.mean(y32**2)) + 1e-12))

    out = {
        "embedding_cosine_min": float(cos.min()),
        "embedding_cosine_mean": float(cos.mean()),
        "converter_nrmse": nrmse,
        # north-star is cosine >= 0.999 vs the reference; the bf16-vs-f32
        # cosine is the margin bf16 serving leaves against that target
        "pass": bool(cos.min() >= 0.999),
    }
    print(
        f"bf16 fidelity: cosine min={cos.min():.6f} mean={cos.mean():.6f} "
        f"converter nrmse={nrmse:.3e}",
        flush=True,
    )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    backend = jax.default_backend()
    report = {"backend": backend}
    report["envelope_kernel"] = check_envelope_kernel()
    report["fused_kernel_blocks"] = check_fused_kernel_blocks()
    report["full_model_fused_vs_xla"] = check_full_model_fused_vs_xla()
    report["bf16_fidelity"] = check_bf16_fidelity()
    report["all_pass"] = all(
        report[k].get("pass", False)
        for k in (
            "envelope_kernel",
            "fused_kernel_blocks",
            "full_model_fused_vs_xla",
            "bf16_fidelity",
        )
    )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "TPU_CHECKS.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out_path}  all_pass={report['all_pass']}")
    return 0 if report["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())

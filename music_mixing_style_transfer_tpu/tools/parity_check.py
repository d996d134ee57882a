"""Checkpoint parity harness: JAX vs PyTorch forward on the same weights.

Measures the north-star fidelity target (BASELINE.md: FXencoder embedding
cosine >= 0.999 vs the reference) given a published checkpoint: the torch
side is evaluated *functionally* from the raw state_dict (F.conv1d /
F.batch_norm — no reference code needed), the JAX side through this
framework's models, and the report prints embedding cosine / waveform error.

    python -m music_mixing_style_transfer_tpu.tools.parity_check \
        --enc weights/FXencoder_ps.pt [--conv weights/MixFXcloner_ps.pt] \
        [--wav song.wav] [--seconds 5] [--reference_root /root/reference]

With ``--reference_root`` pointing at a checkout of the reference repo, the
torch side runs the reference's REAL ``FXencoder``/``TCNModel`` classes
(via ``tools/reference_import.py``) instead of the functional state_dict
forward — the strongest possible fidelity check against published weights.
"""
from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np


# ---------------------------------------------------------------- torch side
def torch_fxencoder_forward(sd: Dict[str, np.ndarray], x: np.ndarray, n_blocks: int = 12) -> np.ndarray:
    """Functional FXencoder eval forward from a raw state_dict.

    Implements the documented semantics (SURVEY.md §2.4): per block, conv1
    (reflect SAME pad, ch-preserving) -> BN -> ReLU, +residual; conv2
    (strided) -> BN -> ReLU; final temporal mean.
    """
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x)

    def conv_layer(t, base: str, stride: int):
        w = torch.from_numpy(sd[f"{base}.conv1d.weight"])
        b = torch.from_numpy(sd[f"{base}.conv1d.bias"])
        k = w.shape[-1]
        pad = k - 1
        t = F.pad(t, (pad // 2, pad - pad // 2), mode="reflect")
        t = F.conv1d(t, w, b, stride=stride)
        t = F.batch_norm(
            t,
            torch.from_numpy(sd[f"{base}.batch_norm.running_mean"]),
            torch.from_numpy(sd[f"{base}.batch_norm.running_var"]),
            torch.from_numpy(sd[f"{base}.batch_norm.weight"]),
            torch.from_numpy(sd[f"{base}.batch_norm.bias"]),
            training=False,
        )
        return F.relu(t)

    strides = [4, 4, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1]
    with torch.no_grad():
        for i in range(n_blocks):
            t = conv_layer(t, f"encoder.{i}.conv1.conv1d", 1) + t
            t = conv_layer(t, f"encoder.{i}.conv2.conv1d", strides[i])
        return t.mean(-1).numpy()


def torch_mixfxcloner_forward(
    sd: Dict[str, np.ndarray], x: np.ndarray, cond: np.ndarray, n_blocks: int = 14
) -> np.ndarray:
    """Functional MixFXcloner eval forward from a raw state_dict."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x)
    c = torch.from_numpy(cond)
    with torch.no_grad():
        for n in range(n_blocks):
            base = f"blocks.{n}"
            w = torch.from_numpy(sd[f"{base}.conv1.weight"])
            k = w.shape[-1]
            d = 2 ** (n % 15)
            h = F.conv1d(t, w, None, padding=((k - 1) * d) // 2, dilation=d)
            h = F.batch_norm(
                h,
                torch.from_numpy(sd[f"{base}.bn.running_mean"]),
                torch.from_numpy(sd[f"{base}.bn.running_var"]),
                torch.from_numpy(sd[f"{base}.bn.weight"]),
                torch.from_numpy(sd[f"{base}.bn.bias"]),
                training=False,
            )
            h = F.leaky_relu(h, 0.01)
            film = F.linear(
                c,
                torch.from_numpy(sd[f"{base}.film.film_fc.weight"]),
                torch.from_numpy(sd[f"{base}.film.film_fc.bias"]),
            ).unsqueeze(-1)
            r, b = torch.split(film, film.shape[1] // 2, dim=1)
            h = r * h + b
            res = F.conv1d(t, torch.from_numpy(sd[f"{base}.res.weight"]), None, groups=t.shape[1])
            t = h + res
        out = F.conv1d(
            t,
            torch.from_numpy(sd["output.weight"]),
            torch.from_numpy(sd["output.bias"]),
        )
        return torch.clamp(out, -1, 1).numpy()


# ------------------------------------------------- real-reference torch side
def _reference_fxencoder_forward(
    sd: Dict[str, np.ndarray], x: np.ndarray, reference_root: str
) -> np.ndarray:
    """Forward through the reference repo's REAL FXencoder class."""
    import torch

    from .reference_import import build_reference_fxencoder, import_reference_networks

    arch = import_reference_networks(reference_root)
    model = build_reference_fxencoder(arch, reference_root)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x)).numpy()


def _reference_mixfxcloner_forward(
    sd: Dict[str, np.ndarray], x: np.ndarray, cond: np.ndarray, reference_root: str
) -> np.ndarray:
    """Forward through the reference repo's REAL TCNModel class."""
    import torch

    from .reference_import import build_reference_tcn, import_reference_networks

    arch = import_reference_networks(reference_root)
    model = build_reference_tcn(arch, reference_root)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x), torch.from_numpy(cond)).numpy()


# ---------------------------------------------------------------- report
def check_encoder(enc_ckpt: str, x: np.ndarray, reference_root: str = None) -> float:
    import jax.numpy as jnp

    from ..models import FXencoder
    from ..models.torch_import import fxencoder_from_torch, load_torch_state_dict

    sd = load_torch_state_dict(enc_ckpt)
    if reference_root:
        ref = _reference_fxencoder_forward(sd, x, reference_root)
    else:
        ref = torch_fxencoder_forward(sd, x)
    variables = fxencoder_from_torch(sd)
    ours = np.asarray(FXencoder().apply(variables, jnp.asarray(x)))
    cos = float(
        np.mean(
            np.sum(ref * ours, -1)
            / np.maximum(np.linalg.norm(ref, axis=-1) * np.linalg.norm(ours, axis=-1), 1e-12)
        )
    )
    print(f"FXencoder embedding cosine: {cos:.6f}  (target >= 0.999)")
    return cos


def check_converter(
    conv_ckpt: str, x: np.ndarray, cond: np.ndarray, reference_root: str = None
) -> float:
    import jax.numpy as jnp

    from ..models import MixFXcloner
    from ..models.torch_import import load_torch_state_dict, mixfxcloner_from_torch

    sd = load_torch_state_dict(conv_ckpt)
    if reference_root:
        ref = _reference_mixfxcloner_forward(sd, x, cond, reference_root)
    else:
        ref = torch_mixfxcloner_forward(sd, x, cond)
    variables = mixfxcloner_from_torch(sd)
    ours = np.asarray(MixFXcloner().apply(variables, jnp.asarray(x), jnp.asarray(cond)))
    err = float(np.sqrt(np.mean((ref - ours) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12))
    print(f"MixFXcloner waveform NRMSE: {err:.2e}")
    return err


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--enc", type=str, default=None)
    p.add_argument("--conv", type=str, default=None)
    p.add_argument("--wav", type=str, default=None)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument(
        "--reference_root",
        type=str,
        default=None,
        help="path to a reference-repo checkout; torch side then runs the "
        "REAL reference model classes instead of the functional forward",
    )
    args = p.parse_args(argv)

    if args.wav:
        from ..data.wavio import read_wav_stereo_ct

        x = read_wav_stereo_ct(args.wav)[None, :, : int(44100 * args.seconds)]
    else:
        x = (np.random.default_rng(0).standard_normal((1, 2, int(44100 * args.seconds))) * 0.1).astype(np.float32)
    x = np.asarray(x, np.float32)

    if args.enc:
        check_encoder(args.enc, x, args.reference_root)
    if args.conv:
        cond = np.random.default_rng(1).standard_normal((1, 2048)).astype(np.float32)
        check_converter(args.conv, x, cond, args.reference_root)
    if not (args.enc or args.conv):
        p.error("provide --enc and/or --conv checkpoint paths")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""PyTorch checkpoint -> JAX param pytree conversion.

The published reference checkpoints (``FXencoder_ps.pt``, ``MixFXcloner_ps.pt``,
reference ``README.md:12-16``) are torch ``state_dict``s saved under a
``"model"`` key with DDP ``module.`` prefixes
(``inference/style_transfer.py:94-108``). This module maps those tensors onto
the flax param/batch_stats pytrees of :class:`~..models.FXencoder` and
:class:`~..models.MixFXcloner`.

Because our conv kernels are stored in the torch layout ``[out, in, k]``,
conversion is a pure renaming — no transposes.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _strip_ddp(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file into a flat numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: _np(v) for k, v in _strip_ddp(sd).items()}


def fxencoder_from_torch(
    state_dict: Mapping[str, np.ndarray], n_blocks: int = 12
) -> Dict[str, Any]:
    """Convert an FXencoder torch state_dict to flax variables.

    torch naming (reference ``FXencoder``/``Res_ConvBlock``/``Conv1d_layer``):
    ``encoder.{i}.conv{1,2}.conv1d.conv1d.{weight,bias}`` and
    ``encoder.{i}.conv{1,2}.conv1d.batch_norm.{weight,bias,running_mean,running_var}``.
    """
    sd = {k: _np(v) for k, v in _strip_ddp(dict(state_dict)).items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_blocks):
        pblock: Dict[str, Any] = {}
        sblock: Dict[str, Any] = {}
        for conv in ("conv1", "conv2"):
            base = f"encoder.{i}.{conv}.conv1d"
            pconv = {
                "weight": sd[f"{base}.conv1d.weight"],
                "bias": sd[f"{base}.conv1d.bias"],
                "bn": {
                    "scale": sd[f"{base}.batch_norm.weight"],
                    "bias": sd[f"{base}.batch_norm.bias"],
                },
            }
            sconv = {
                "bn": {
                    "mean": sd[f"{base}.batch_norm.running_mean"],
                    "var": sd[f"{base}.batch_norm.running_var"],
                }
            }
            pblock[conv] = pconv
            sblock[conv] = sconv
        params[f"block{i}"] = pblock
        stats[f"block{i}"] = sblock
    return {"params": params, "batch_stats": stats}


def mixfxcloner_from_torch(
    state_dict: Mapping[str, np.ndarray], n_blocks: int = 14
) -> Dict[str, Any]:
    """Convert a MixFXcloner (TCNModel) torch state_dict to flax variables.

    torch naming (reference ``TCNBlock``): ``blocks.{n}.conv1.weight``,
    ``blocks.{n}.bn.{...}``, ``blocks.{n}.film.film_fc.{weight,bias}``,
    ``blocks.{n}.res.weight``, and ``output.{weight,bias}``.
    """
    sd = {k: _np(v) for k, v in _strip_ddp(dict(state_dict)).items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for n in range(n_blocks):
        base = f"blocks.{n}"
        params[f"block{n}"] = {
            "conv1_weight": sd[f"{base}.conv1.weight"],
            "res_weight": sd[f"{base}.res.weight"],
            "bn": {
                "scale": sd[f"{base}.bn.weight"],
                "bias": sd[f"{base}.bn.bias"],
            },
            "film": {
                "weight": sd[f"{base}.film.film_fc.weight"],
                "bias": sd[f"{base}.film.film_fc.bias"],
            },
        }
        stats[f"block{n}"] = {
            "bn": {
                "mean": sd[f"{base}.bn.running_mean"],
                "var": sd[f"{base}.bn.running_var"],
            }
        }
    params["output_weight"] = sd["output.weight"]
    params["output_bias"] = sd["output.bias"]
    return {"params": params, "batch_stats": stats}


def load_fxencoder_variables(path: str) -> Dict[str, Any]:
    return fxencoder_from_torch(load_torch_state_dict(path))


def load_mixfxcloner_variables(path: str) -> Dict[str, Any]:
    return mixfxcloner_from_torch(load_torch_state_dict(path))

"""Checkpoint conversion CLI: published PyTorch checkpoints -> orbax.

Converts the reference's released weights (``FXencoder_ps.pt``,
``MixFXcloner_ps.pt``; reference README.md:12-16) into orbax checkpoints
restorable by the training/inference stack (the inference engine can also
load the .pt files directly — this exists for users who want a pure-JAX
artifact).

    python -m music_mixing_style_transfer_tpu.models.convert_ckpt \
        --model fxencoder --torch_ckpt weights/FXencoder_ps.pt --out runs/enc_converted
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["fxencoder", "mixfxcloner"], required=True)
    p.add_argument("--torch_ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from .torch_import import load_fxencoder_variables, load_mixfxcloner_variables

    if args.model == "fxencoder":
        variables = load_fxencoder_variables(args.torch_ckpt)
    else:
        variables = load_mixfxcloner_variables(args.torch_ckpt)

    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"converted {args.model}: {n:,} parameters")

    path = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "variables"), variables, force=True)
    ckptr.wait_until_finished()
    print(f"wrote orbax checkpoint: {path}/variables")
    return 0


def load_orbax_variables(path: str):
    """Restore variables written by this converter."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "variables"))


if __name__ == "__main__":
    sys.exit(main())

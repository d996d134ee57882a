"""Unified model-checkpoint loading for inference/serving.

Accepts every artifact the stack produces or consumes:

- published PyTorch ``.pt`` files (reference README.md:12-16) — a file path
  (``models/torch_import.py``: DDP ``module.`` strip, torch->flax layout);
- ``models/convert_ckpt.py`` output — a directory containing ``variables``;
- trainer checkpoints (``train/checkpoint.py`` CheckpointManager) — a
  directory of numeric step subdirectories; the latest step's
  ``params``/``batch_stats`` are extracted (optimizer state dropped).

The sniffing is structural, so ``StyleTransferEngine``/``serve`` accept any
of the three with the same ``--ckpt_path_*`` flag.
"""
from __future__ import annotations

import os
from typing import Any, Dict


def _is_trainer_ckpt_dir(path: str) -> bool:
    try:
        return any(name.isdigit() for name in os.listdir(path))
    except OSError:
        return False


def load_model_variables(path: str, model: str) -> Dict[str, Any]:
    """Load ``{"params": ..., "batch_stats": ...}`` for ``model`` in
    {"fxencoder", "mixfxcloner"} from any supported checkpoint format."""
    path = os.path.abspath(path)
    if os.path.isfile(path):
        from .torch_import import load_fxencoder_variables, load_mixfxcloner_variables

        if model == "fxencoder":
            return load_fxencoder_variables(path)
        return load_mixfxcloner_variables(path)

    if os.path.isdir(os.path.join(path, "variables")):
        from .convert_ckpt import load_orbax_variables

        return load_orbax_variables(path)

    if _is_trainer_ckpt_dir(path):
        import jax
        import numpy as np
        import orbax.checkpoint as ocp

        steps = sorted(int(n) for n in os.listdir(path) if n.isdigit())
        step_dir = os.path.join(path, str(steps[-1]), "default")
        # Restore as host numpy arrays, ignoring the shardings baked in at
        # save time — a checkpoint written on the TPU backend must load on
        # CPU (and vice versa); the engine re-places leaves on its own
        # device anyway.
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(step_dir).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        raw = ckptr.restore(step_dir, restore_args=restore_args)
        state = raw["state"]
        return {"params": state["params"], "batch_stats": state["batch_stats"]}

    raise FileNotFoundError(
        f"{path}: not a torch .pt file, a convert_ckpt directory, or a "
        "trainer checkpoint directory"
    )

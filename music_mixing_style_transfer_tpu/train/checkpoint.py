"""Checkpointing: orbax-backed save/restore with keep-last-N retention.

Replaces the reference's torch.save checkpoint utilities
(``modules/training_utils.py:13-123``: epoch-numbered files, resume from the
highest epoch, keep last 2). Also provides the torch->JAX import path for
the published checkpoints (``models/torch_import.py``).
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Step-numbered checkpoints with retention (reference keeps last 2)."""

    def __init__(self, directory: str, keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None) -> None:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state_template`` (highest step by
        default — reference ``find_best_epoch`` semantics)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": state_template})
        )
        return restored["state"]

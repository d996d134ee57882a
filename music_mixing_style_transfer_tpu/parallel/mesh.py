"""Device-mesh helpers for SPMD training.

The reference scales with torch DDP + NCCL (``training_utils.py:127-172``,
``style_transfer.py:326-328``); here the equivalent is a 1-D ``data`` mesh
with pjit/shard_map — batch sharded over ICI, parameters replicated,
NT-Xent negatives shared with ``jax.lax.all_gather`` (see ``losses.nt_xent``)
and gradients averaged with ``psum``. An 81M-param encoder fits on one chip,
so no tensor/pipeline sharding is required (SURVEY.md §2.2); FSDP-style
parameter sharding can be layered on the same mesh later.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D (or reshaped) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"({[d.platform for d in devices]}); for a virtual CPU mesh "
                "set JAX_PLATFORMS=cpu and "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N before "
                "JAX backend init"
            )
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        # split trailing axes evenly; default everything on the first axis
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
        arr = arr.reshape(shape)
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

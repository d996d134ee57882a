"""Persistent XLA compile cache location (per-user to avoid collisions)."""
from __future__ import annotations

import getpass
import os
import tempfile


def compile_cache_dir() -> str:
    """Per-user persistent compile cache path.

    Honors ``JAX_COMPILATION_CACHE_DIR`` if set; otherwise a user-suffixed
    directory under the system temp dir (a fixed world-shared /tmp path
    breaks on multi-user machines: first user owns it 0755, others cannot
    write cache entries).
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    try:
        user = getpass.getuser()
    except Exception:
        user = str(os.getuid()) if hasattr(os, "getuid") else "user"
    return os.path.join(tempfile.gettempdir(), f"jax_cache-{user}")


def enable_compile_cache() -> str:
    """Point jax at the persistent compile cache; returns the path.

    CPU-backend processes get a ``-cpu``-suffixed directory of their own:
    on remote-compile rigs (``PALLAS_AXON_REMOTE_COMPILE``) the shared cache
    fills with XLA:CPU AOT executables compiled for the *service's* machine,
    which the local loader rejects on every load with machine-feature
    mismatch errors ("could lead to SIGILL") — so a mixed directory gives
    local CPU runs zero hits plus a failed-load penalty per executable.
    """
    import jax

    path = compile_cache_dir()
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR") and jax.default_backend() == "cpu":
        path += "-cpu"
    jax.config.update("jax_compilation_cache_dir", path)
    return path

"""Device profiling helpers (SURVEY.md §5.1 — the reference has none).

Wraps ``jax.profiler`` traces and adds a simple per-step device-time probe.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median wall time per call with a scalar device sync (robust against
    slow device->host links: syncs via a 4-byte reduction, not the output)."""
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _sync(out) -> None:
    import jax.numpy as jnp

    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))

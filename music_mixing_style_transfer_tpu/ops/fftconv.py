"""FFT convolution for TPU (reverb engine).

Replaces scipy ``oaconvolve`` in the reference ConvolutionalReverb
(``common_audioeffects.py:753``). On TPU a single large rfft is faster than
host-side overlap-add for the sizes involved (<= seconds of audio x IR), and
it fuses with the surrounding elementwise work under jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _next_fast_len(n: int) -> int:
    """Next 5-smooth size >= n (XLA FFT is efficient for 2/3/5 radices)."""
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            # round up to next power of two multiple
            rem = -(-n // f35)
            p2 = 1 << max(rem - 1, 0).bit_length()
            cand = f35 * p2
            if n <= cand < best:
                best = cand
            f35 *= 3
        f5 *= 5
    return best


def fft_convolve_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full linear convolution along the last axis.

    ``x [..., T]``, ``h [..., L]`` (broadcastable batch dims) ->
    ``[..., T + L - 1]``.
    """
    T = x.shape[-1]
    L = h.shape[-1]
    n = _next_fast_len(T + L - 1)
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(h, n=n, axis=-1)
    y = jnp.fft.irfft(X * H, n=n, axis=-1)
    return y[..., : T + L - 1]


@partial(jax.jit, static_argnames=("trim_to_input",))
def convolve_wet(x: jnp.ndarray, h: jnp.ndarray, peak_idx: jnp.ndarray, trim_to_input: bool = True) -> jnp.ndarray:
    """Reverb wet path: full conv then slice starting at the IR peak index
    (reference ``common_audioeffects.py:752-761``), returning x-length audio.

    ``peak_idx`` may be traced (dynamic slice).
    """
    y = fft_convolve_full(x, h)
    if trim_to_input:
        T = x.shape[-1]
        start = jnp.clip(peak_idx, 0, h.shape[-1] - 1)
        y = jax.lax.dynamic_slice_in_dim(y, start, T, axis=-1)
    return y

"""Stereo-image normalization (mid/side + panning balance).

Re-design of ``mixing_manipulator/normalization_imager.py:22-113``:
  1. if the input is near-mono (mid energy ratio > threshold), stereoize it
     with a (randomized) Haas effect + RMS re-normalization
  2. balance mid/side energies to the precomputed target
  3. balance left/right to 50-50
  4. balance mid/side again
All pure jnp on ``[2, T]`` audio.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..fx.processors import Haas, rms_normalize


def lr_to_ms(left: jnp.ndarray, right: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return left + right, left - right


def ms_to_lr(mid: jnp.ndarray, side: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (mid + side) / 2.0, (mid - side) / 2.0


def process_balance(d1, d2, tgt_e1_bal=0.5, eps=1e-4):
    """Rebalance two signals' energies to (tgt, 1-tgt) of the total
    (reference ``normalization_imager.py:86-99``)."""
    e1 = jnp.sum(d1**2)
    e2 = jnp.sum(d2**2)
    total = e1 + e2
    g1 = jnp.sqrt(tgt_e1_bal * total / (e1 + eps))
    new_d1 = d1 * g1
    new_e1 = e1 * g1**2
    left_e1 = total - new_e1
    g2 = jnp.sqrt(jnp.maximum(left_e1, 0.0) / (e2 + 1e-3))
    return new_d1, d2 * g2


@partial(jax.jit, static_argnames=("sr",))
def normalize_imager(
    audio: jnp.ndarray,
    target_side_mid_bal: float = 0.9,
    mono_threshold: float = 0.95,
    sr: int = 44100,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Normalize stereo image of ``[2, T]`` audio to the target balance."""
    if key is None:
        key = jax.random.PRNGKey(0)

    mid, side = lr_to_ms(audio[0], audio[1])
    mid_e = jnp.sum(mid**2)
    side_e = jnp.sum(side**2)
    is_mono = mid_e / (mid_e + side_e) > mono_threshold

    haas = Haas(sample_rate=sr)
    hp = haas.sample(key)
    stereoized = rms_normalize(audio, haas.apply(hp, audio))
    audio = jnp.where(is_mono, stereoized, audio)

    mid, side = lr_to_ms(audio[0], audio[1])
    new_mid, new_side = process_balance(mid, side, target_side_mid_bal)
    left, right = ms_to_lr(new_mid, new_side)

    left, right = process_balance(left, right, 0.5)
    mid, side = lr_to_ms(left, right)

    new_mid, new_side = process_balance(mid, side, target_side_mid_bal)
    left, right = ms_to_lr(new_mid, new_side)
    return jnp.stack([left, right], axis=0)

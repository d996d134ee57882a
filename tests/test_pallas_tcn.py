"""Fused Pallas TCN-block kernel vs XLA reference math (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.models import MixFXcloner
from music_mixing_style_transfer_tpu.models.fast_init import fast_init
from music_mixing_style_transfer_tpu.ops.pallas.tcn_block import (
    fused_block_applicable,
    fused_tcn_block,
)

C, K = 128, 15


def _reference(x, w, s, t, r, b, wr, d):
    dn = jax.lax.conv_dimension_numbers(x.shape, (K, C, C), ("NHC", "HIO", "NHC"))
    pad = (K - 1) * d // 2
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1,), [(pad, pad)],
        rhs_dilation=(d,), dimension_numbers=dn,
    )
    y = h * s[None, None, :] + t[None, None, :]
    y = jnp.where(y >= 0, y, 0.01 * y)
    y = y * r[:, None, :] + b[:, None, :]
    return y + x.astype(jnp.float32) * wr[None, None, :]


@pytest.mark.parametrize("d", [8, 64, 512])
def test_fused_block_matches_reference(rng, d):
    B, T = 2, 2**13
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.float32)
    s = jnp.asarray(rng.standard_normal(C) * 0.2 + 1, jnp.float32)
    t = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    r = jnp.asarray(rng.standard_normal((B, C)) * 0.2 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    wr = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    got = np.asarray(fused_tcn_block(x, w, s, t, r, b, wr, d=d, interpret=True))
    want = np.asarray(_reference(x, w, s, t, r, b, wr, d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_block_edge_zero_padding(rng):
    """Taps beyond the signal edges must read zeros (torch zero-pad parity):
    an impulse at t=0 spreads exactly k//2 taps forward per dilation."""
    d = 8
    B, T = 1, 2**12
    x = jnp.zeros((B, T, C), jnp.float32).at[0, 0, 0].set(1.0)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.1, jnp.float32)
    s = jnp.ones(C, jnp.float32)
    t = jnp.zeros(C, jnp.float32)
    r = jnp.ones((B, C), jnp.float32)
    b = jnp.zeros((B, C), jnp.float32)
    wr = jnp.zeros(C, jnp.float32)
    got = np.asarray(fused_tcn_block(x, w, s, t, r, b, wr, d=d, interpret=True))
    want = np.asarray(_reference(x, w, s, t, r, b, wr, d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_applicability_gate():
    assert fused_block_applicable(128, 8, 2**19)
    assert fused_block_applicable(128, 8192, 2**19)
    assert not fused_block_applicable(128, 4, 2**19)   # narrow fold is slow
    assert not fused_block_applicable(64, 8, 2**19)    # lane-misaligned C
    assert not fused_block_applicable(128, 8, 2**19 + 1)  # T % d != 0
    assert not fused_block_applicable(128, 8192, 2**14)   # H < 4


def test_mixfxcloner_fused_matches_unfused(rng):
    """Full model, fused='on' (interpret on CPU) vs fused='off'."""
    T = 2**12
    off = MixFXcloner(fused="off")
    on = MixFXcloner(fused="on")
    cv = fast_init(off, jnp.zeros((1, 2, T)), jnp.zeros((1, 2048)))
    x = jnp.asarray(rng.standard_normal((2, 2, T)) * 0.1, jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 2048)) * 0.1, jnp.float32)
    a = np.asarray(off.apply(cv, x, cond))
    b = np.asarray(on.apply(cv, x, cond))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_mixfxcloner_auto_is_xla_on_cpu(rng):
    """fused='auto' must not engage the TPU kernel on CPU backends."""
    T = 2**12
    auto = MixFXcloner(fused="auto")
    off = MixFXcloner(fused="off")
    cv = fast_init(off, jnp.zeros((1, 2, T)), jnp.zeros((1, 2048)))
    x = jnp.asarray(rng.standard_normal((1, 2, T)) * 0.1, jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 2048)) * 0.1, jnp.float32)
    a = np.asarray(off.apply(cv, x, cond))
    b = np.asarray(auto.apply(cv, x, cond))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("d", [8, 1024])
def test_fused_block_non_pow2_length(rng, d):
    """Lengths like 3*2^n (segment+halo paths) exercise the Ht divisor
    search; results must still match the reference conv."""
    B, T = 1, 3 * 2**12
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.float32)
    s = jnp.ones(C, jnp.float32)
    t = jnp.zeros(C, jnp.float32)
    r = jnp.ones((B, C), jnp.float32)
    b = jnp.zeros((B, C), jnp.float32)
    wr = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    got = np.asarray(fused_tcn_block(x, w, s, t, r, b, wr, d=d, interpret=True))
    want = np.asarray(_reference(x, w, s, t, r, b, wr, d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_applicability_rejects_small_divisor_heights():
    """H whose only divisors <= tile target are < 7 would make interior
    tiles DMA negative rows (silent corruption) — must fall back to XLA."""
    # T=4304, d=8 -> H=538=2*269: largest usable divisor is 2 (< halo 7)
    assert not fused_block_applicable(128, 8, 4304)
    with pytest.raises(ValueError):
        fused_tcn_block(
            jnp.zeros((1, 4304, C)), jnp.zeros((K, C, C)),
            jnp.ones(C), jnp.zeros(C), jnp.ones((1, C)), jnp.zeros((1, C)),
            jnp.zeros(C), d=8, interpret=True,
        )

"""Native C++ DSP library: build, bind, and cross-check against JAX/scipy."""
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from music_mixing_style_transfer_tpu import native
from music_mixing_style_transfer_tpu.ops import (
    biquad_apply,
    compressor_process as jax_compressor,
    rbj_coeffs,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_compressor_matches_jax(rng):
    x = (rng.standard_normal((2, 6000)) * 0.5).astype(np.float32)
    y_native = native.compressor_process(x, -20.0, 5.0, 120.0, 6.0)
    y_jax = np.asarray(jax_compressor(jnp.asarray(x), -20.0, 5.0, 120.0, 6.0, 0.0))
    np.testing.assert_allclose(y_native, y_jax, rtol=1e-3, atol=1e-4)


def test_native_compressor_expander(rng):
    x = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    y_native = native.compressor_process(x, -20.0, 5.0, 120.0, 0.25)
    y_jax = np.asarray(jax_compressor(jnp.asarray(x), -20.0, 5.0, 120.0, 0.25, 0.0))
    np.testing.assert_allclose(y_native, y_jax, rtol=1e-3, atol=1e-4)


def test_native_biquad_matches_scipy(rng):
    coeffs = np.asarray(rbj_coeffs("peaking", 8.0, 0.9, 1500.0, 44100.0), np.float64)
    x = rng.standard_normal(4000).astype(np.float32)
    ref = scipy.signal.lfilter(coeffs[:3], [1.0, coeffs[3], coeffs[4]], x)
    y = native.biquad_lfilter(x, coeffs)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_native_cascade_matches_jax(rng):
    cs = np.stack(
        [
            np.asarray(rbj_coeffs("low_shelf", 5.0, 0.707, 100.0, 44100.0)),
            np.asarray(rbj_coeffs("peaking", -6.0, 1.2, 2000.0, 44100.0)),
            np.asarray(rbj_coeffs("high_shelf", 3.0, 0.707, 8000.0, 44100.0)),
        ]
    ).astype(np.float64)
    x = rng.standard_normal(5000).astype(np.float32)
    y_native = native.biquad_cascade(x, cs)
    y_jax = np.asarray(x)
    for c in cs:
        y_jax = np.asarray(biquad_apply(jnp.asarray(y_jax), jnp.asarray(c, jnp.float32)))
    rms = np.sqrt(np.mean(y_native**2))
    assert np.sqrt(np.mean((y_native - y_jax) ** 2)) / rms < 2e-3

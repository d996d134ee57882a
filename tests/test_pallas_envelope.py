"""Pallas envelope kernel vs the scan reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.ops.compressor import compressor_process
from music_mixing_style_transfer_tpu.ops.pallas.envelope import compressor_pallas


@pytest.mark.parametrize("ratio", [4.0, 0.25])
def test_pallas_matches_scan(rng, ratio):
    x = (rng.standard_normal((3, 3000)) * 0.4).astype(np.float32)
    ref = np.asarray(
        compressor_process(jnp.asarray(x), -20.0, 5.0, 120.0, ratio, 0.0)
    )
    out = np.asarray(
        compressor_pallas(jnp.asarray(x), -20.0, 5.0, 120.0, ratio, time_chunk=512)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_per_lane_params(rng):
    x = (rng.standard_normal((4, 2000)) * 0.4).astype(np.float32)
    ths = np.asarray([-10.0, -20.0, -30.0, -40.0], np.float32)
    out = np.asarray(
        compressor_pallas(jnp.asarray(x), jnp.asarray(ths), 5.0, 120.0, 4.0, time_chunk=512)
    )
    for i in range(4):
        ref = np.asarray(
            compressor_process(jnp.asarray(x[i]), float(ths[i]), 5.0, 120.0, 4.0, 0.0)
        )
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-5)


def test_pallas_time_chunk_carry(rng):
    """State must carry across time chunks (multiple grid steps)."""
    x = (rng.standard_normal(2048) * 0.4).astype(np.float32)
    ref = np.asarray(compressor_process(jnp.asarray(x), -25.0, 2.0, 300.0, 8.0, 0.0))
    out = np.asarray(
        compressor_pallas(jnp.asarray(x), -25.0, 2.0, 300.0, 8.0, time_chunk=512)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_envelope_attack_slower_than_release(rng):
    from music_mixing_style_transfer_tpu.ops import compressor_process
    from music_mixing_style_transfer_tpu.ops.pallas.envelope import compressor_pallas

    x = jnp.asarray(rng.standard_normal((3, 4096)) * 0.4, jnp.float32)
    y_scan = np.asarray(compressor_process(x, -18.0, 250.0, 40.0, 5.0, 0.0))
    y_k = np.asarray(
        compressor_pallas(x, -18.0, 250.0, 40.0, 5.0, interpret=True)
    )
    np.testing.assert_allclose(y_k, y_scan, rtol=1e-4, atol=1e-5)


def test_pallas_slab_carry_matches_scan(rng):
    """Whole-song lengths stream through the kernel in time slabs with the
    envelope state carried between calls; the result must be bit-compatible
    with the unslabbed scan (slab boundary at T > slab_T = 2^27/1024 =
    131072 when one lane block is padded)."""
    T = 140_000  # crosses one slab boundary
    x = (rng.standard_normal((2, T)) * 0.4).astype(np.float32)
    ref = np.asarray(compressor_process(jnp.asarray(x), -22.0, 3.0, 200.0, 6.0, 0.0))
    out = np.asarray(
        compressor_pallas(jnp.asarray(x), -22.0, 3.0, 200.0, 6.0, time_chunk=512)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

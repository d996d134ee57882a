"""Shape utilities and profiling helper tests."""
import numpy as np

import jax.numpy as jnp

from music_mixing_style_transfer_tpu.ops.shapes import (
    is_complete_convolution,
    pad_to_length,
    td_length_from_fd,
    valid_length,
)
from music_mixing_style_transfer_tpu.utils import RTFMeter, Timer, device_time


def test_pad_to_length():
    x = jnp.ones((2, 10))
    assert pad_to_length(x, 15).shape == (2, 15)
    assert pad_to_length(x, 5).shape == (2, 5)
    assert float(pad_to_length(x, 15)[0, -1]) == 0.0


def test_valid_length_and_complete():
    L = valid_length(1000, kernel_size=15, stride=4)
    assert is_complete_convolution(L, 15, stride=4)
    assert L >= 1000


def test_td_length_from_fd():
    # 10 frames of 1024-FFT at hop 256 need (10-1)*256 + 1024 samples
    assert td_length_from_fd(10, 1024, 256) == 9 * 256 + 1024


def test_timer_and_rtf():
    t = Timer()
    with t.section("a"):
        pass
    assert "a" in t.totals
    m = RTFMeter()
    with m.measure(44100):
        pass
    assert m.rtf > 0


def test_device_time_scalar_sync():
    f = lambda x: x * 2
    dt = device_time(f, jnp.ones((8, 8)), iters=2)
    assert dt >= 0

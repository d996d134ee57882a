"""STFT front-end / back-end feature converters.

Re-design of reference ``modules/front_back_end.py:9-211``:

- ``FrontEnd``: waveform -> stacked spectral features with torch.stft
  conventions (center=True reflect pad, periodic window). Mode slicing
  matches the reference exactly: 'cplx' drops the Nyquist bin, 'mag' drops
  the DC bin, and the trailing frame is trimmed when ``T % (n_fft//4) == 0``.
- ``BackEnd``: spectral features -> waveform (iSTFT for 'cplx'/'mag_phase',
  Griffin-Lim for 'griff'). The reference's griffin_lim is dead code with
  undefined symbols (``front_back_end.py:195-211``); this one works.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, hamming_window, istft, magnitude, stft


class FrontEnd:
    def __init__(
        self,
        channel: str = "stereo",
        n_fft: int = 2048,
        hop_length: Optional[int] = None,
        win_length: Optional[int] = None,
        window: str = "hann",
    ):
        self.channel = channel
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.win_length = win_length or n_fft
        self.window = (
            hann_window(self.win_length) if window == "hann" else hamming_window(self.win_length)
        )

    def _stft(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, bins, frames] complex."""
        spec = stft(x, self.n_fft, self.hop_length, self.window, center=True)
        return jnp.swapaxes(spec, -1, -2)

    def __call__(self, x: jnp.ndarray, mode: Sequence[str]) -> jnp.ndarray:
        """``x``: [B, T] (mono) or [B, 2, T] (stereo) -> [B, C, bins, frames]."""
        outputs: List[jnp.ndarray] = []
        T = x.shape[-1]
        for cur in mode:
            if cur == "cplx":
                if self.channel == "mono":
                    s = self._stft(x)
                    feats = jnp.stack([s.real, s.imag], axis=1)
                else:
                    sl = self._stft(x[:, 0])
                    sr = self._stft(x[:, 1])
                    feats = jnp.stack([sl.real, sl.imag, sr.real, sr.imag], axis=1)
                if T % round(self.n_fft / 4) == 0:
                    feats = feats[..., :-1]
                if self.n_fft % 2 == 0:
                    feats = feats[:, :, :-1]  # drop Nyquist (reference :44-45)
                outputs.append(feats)
            elif cur == "mag":
                if self.channel == "mono":
                    feats = magnitude(self._stft(x))[:, None]
                else:
                    feats = jnp.stack(
                        [magnitude(self._stft(x[:, 0])), magnitude(self._stft(x[:, 1]))],
                        axis=1,
                    )
                if T % round(self.n_fft / 4) == 0:
                    feats = feats[..., :-1]
                if self.n_fft % 2 == 0:
                    feats = feats[:, :, 1:]  # drop DC (reference :61-62)
                outputs.append(feats)
            else:
                raise ValueError(f"unknown front-end mode {cur}")
        return jnp.concatenate(outputs, axis=1) if len(outputs) > 1 else outputs[0]


class BackEnd:
    def __init__(
        self,
        channel: str = "stereo",
        n_fft: int = 2048,
        hop_length: Optional[int] = None,
        win_length: Optional[int] = None,
        window: str = "hann",
        eps: float = 1e-7,
    ):
        self.channel = channel
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.win_length = win_length or n_fft
        self.eps = eps
        self.window = (
            hann_window(self.win_length) if window == "hann" else hamming_window(self.win_length)
        )

    def _istft(self, spec_bt: jnp.ndarray) -> jnp.ndarray:
        """[B, bins, frames] complex -> [B, T]."""
        return istft(jnp.swapaxes(spec_bt, -1, -2), self.hop_length, self.window, center=True)

    def _restore_nyquist(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Re-append the dropped Nyquist bin as zeros (cplx-mode features
        drop the TOP bin, FrontEnd :61)."""
        pad = jnp.zeros(feats.shape[:-2] + (1, feats.shape[-1]), feats.dtype)
        return jnp.concatenate([feats, pad], axis=-2)

    def _restore_dc(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Prepend the dropped DC bin as zeros: mag-mode features drop bin 0
        (FrontEnd :75), and the reference BackEnd likewise prepends
        (``front_back_end.py:124-126`` — ``cat((pad, input))``; its comment
        says "highest frequency" but the code pads the lowest)."""
        pad = jnp.zeros(feats.shape[:-2] + (1, feats.shape[-1]), feats.dtype)
        return jnp.concatenate([pad, feats], axis=-2)

    def cplx_to_wave(self, feats: jnp.ndarray) -> jnp.ndarray:
        """``[B, 2*C, bins-1, frames]`` (real/imag interleaved per channel)
        -> ``[B, C, T]``."""
        n_pairs = feats.shape[1] // 2
        waves = []
        for i in range(n_pairs):
            re = self._restore_nyquist(feats[:, 2 * i])
            im = self._restore_nyquist(feats[:, 2 * i + 1])
            waves.append(self._istft(re + 1j * im))
        return jnp.stack(waves, axis=1)

    def mag_phase_to_wave(self, mag: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """``mag/phase [B, C, bins-1, frames]`` -> ``[B, C, T]``."""
        waves = []
        for c in range(mag.shape[1]):
            m = self._restore_dc(mag[:, c])
            p = self._restore_dc(phase[:, c])
            waves.append(self._istft(m * jnp.exp(1j * p)))
        return jnp.stack(waves, axis=1)

    def griffin_lim(self, mag: jnp.ndarray, n_iter: int = 32, key=None) -> jnp.ndarray:
        """Griffin-Lim phase reconstruction of ``mag [B, bins, frames]``."""
        if key is None:
            key = jax.random.PRNGKey(0)
        phase = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)

        def body(phase, _):
            wav = self._istft(mag * jnp.exp(1j * phase))
            spec = jnp.swapaxes(
                stft(wav, self.n_fft, self.hop_length, self.window, center=True), -1, -2
            )
            # keep frame count aligned with mag
            spec = spec[..., : mag.shape[-1]]
            return jnp.angle(spec), None

        phase, _ = jax.lax.scan(body, phase, None, length=n_iter)
        wav = self._istft(mag * jnp.exp(1j * phase))
        return wav / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-9)

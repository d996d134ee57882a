"""WAV I/O using only the stdlib ``wave`` module + numpy.

Replaces the reference's soundfile/librosa loaders
(``data_loader/loader_utils.py:31-70``, ``common_dataprocessing.py:26-89``)
— the deployment image carries neither; 16/32-bit PCM covers the system's
format contract (44.1 kHz stereo PCM_16).
"""
from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np


def wav_length(path: str) -> int:
    """Number of frames in a WAV file (reference ``load_wav_length``)."""
    with wave.open(path, "r") as w:
        return w.getnframes()


def total_wav_length(paths) -> int:
    return sum(wav_length(p) for p in paths)


def read_wav(
    path: str,
    start: int = 0,
    duration: Optional[int] = None,
    expected_rate: Optional[int] = 44100,
) -> Tuple[np.ndarray, int]:
    """Read (a segment of) a PCM WAV file.

    Returns ``(audio [T, C] float32 in [-1, 1], sample_rate)``.
    """
    with wave.open(path, "r") as w:
        rate = w.getframerate()
        if expected_rate is not None and rate != expected_rate:
            raise ValueError(f"{path}: sample rate {rate} != expected {expected_rate}")
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        if duration is None:
            duration = w.getnframes() - start
        w.setpos(start)
        raw = w.readframes(duration)

    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 2.0**15
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2.0**31
    else:
        raise ValueError(f"{path}: unsupported sample width {width} (need 16/32-bit)")

    return x.reshape(-1, n_channels), rate


def write_wav(path: str, audio: np.ndarray, rate: int = 44100) -> None:
    """Write audio ``[T, C]`` (or ``[T]``) as 16-bit PCM.

    Float input is scaled/clipped; ``int16`` input is written verbatim (the
    device-resident inference path quantizes on device and downloads PCM)."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[:, None]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if audio.dtype == np.int16:
        pcm = audio.astype("<i2", copy=False)
    else:
        audio = np.nan_to_num(audio, nan=0.0, posinf=1.0, neginf=-1.0)
        pcm = np.clip(np.round(audio * 2.0**15), -(2.0**15), 2.0**15 - 1).astype("<i2")
    with wave.open(path, "w") as w:
        w.setnchannels(audio.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def read_wav_stereo_ct(path: str, expected_rate: Optional[int] = 44100) -> np.ndarray:
    """Read whole file as ``[2, T]`` float32, duplicating mono to stereo."""
    x, _ = read_wav(path, expected_rate=expected_rate)
    x = x.T  # [C, T]
    if x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    return x


def read_wav_stereo_ct_i16(path: str, expected_rate: Optional[int] = 44100) -> np.ndarray:
    """Read whole 16-bit PCM file as RAW ``[2, T]`` int16 (mono duplicated).

    The device-resident inference path uploads PCM and dequantizes on device
    — half the host->device traffic of float32 with zero quality loss
    (``x/32768`` reproduces :func:`read_wav` exactly)."""
    with wave.open(path, "r") as w:
        rate = w.getframerate()
        if expected_rate is not None and rate != expected_rate:
            raise ValueError(f"{path}: sample rate {rate} != expected {expected_rate}")
        if w.getsampwidth() != 2:
            raise ValueError(f"{path}: int16 fast path needs 16-bit PCM")
        n_channels = w.getnchannels()
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").reshape(-1, n_channels).T
    if x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    return np.ascontiguousarray(x)

"""Song segmentation for batched whole-song inference.

Re-design of the reference ``batchwise_segmentization``
(``inference/style_transfer.py:274-301``, ``feature_extraction.py:114-140``):
a whole song is zero-padded to a multiple of ``segment_length`` and reshaped
into a single ``[n_segments, C, segment_length]`` array — on TPU the natural
strategy is to treat the segment axis as the batch axis of ONE big forward
pass rather than a Python loop of small batches.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def segment_song(
    audio: np.ndarray, segment_length: int, discard_last: bool = False
) -> Tuple[np.ndarray, int]:
    """``[C, T] -> ([n_segments, C, segment_length], original_T)``.

    Pads the final segment with zeros (or discards it when ``discard_last``).
    """
    C, T = audio.shape
    if discard_last:
        n = T // segment_length
        audio = audio[:, : n * segment_length]
    else:
        pad = (-T) % segment_length
        if pad == 0 and T > 0:
            pad = 0
        if T % segment_length != 0:
            pad = segment_length - T % segment_length
            audio = np.pad(audio, ((0, 0), (0, pad)))
        elif T == 0:
            audio = np.zeros((C, segment_length), audio.dtype)
        n = audio.shape[1] // segment_length
    segments = audio.reshape(C, n, segment_length).transpose(1, 0, 2)
    return np.ascontiguousarray(segments), T


def reassemble_song(segments: np.ndarray, original_length: int) -> np.ndarray:
    """``[n_segments, C, L] -> [C, original_length]`` (concat + trim),
    the inverse of :func:`segment_song` (reference
    ``style_transfer.py:165-169``)."""
    n, C, L = segments.shape
    out = segments.transpose(1, 0, 2).reshape(C, n * L)
    return out[:, :original_length]


def pad_to_batches(segments: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int]:
    """Pad the segment axis to a multiple of ``batch_size`` so the jitted
    forward sees one static shape; returns (padded, n_valid)."""
    n = segments.shape[0]
    pad = (-n) % batch_size
    if pad:
        segments = np.concatenate(
            [segments, np.zeros((pad,) + segments.shape[1:], segments.dtype)], axis=0
        )
    return segments, n


def segment_song_halo(
    audio: np.ndarray, segment_length: int, halo: int
) -> np.ndarray:
    """Segment ``[2, T]`` with ``halo`` samples of real context on each side
    of every segment: ``[n_seg, 2, segment_length + 2*halo]``. The caller
    trims ``[halo : halo + segment_length]`` from each converted segment.
    """
    T = audio.shape[-1]
    n_seg = max(-(-T // segment_length), 1)
    padded = np.pad(audio, ((0, 0), (halo, halo + n_seg * segment_length - T)))
    return np.stack(
        [
            padded[:, s : s + segment_length + 2 * halo]
            for s in np.arange(n_seg) * segment_length
        ]
    )

"""Audio-effects-chain normalizer: the inference-side FX normalization.

Re-design of ``mixing_manipulator/data_normalization.py:19-172``
(``Audio_Effects_Normalizer``): input stems are normalized — in order —
for loudness / EQ / compression / stereo image against precomputed MUSDB18
average features, so the converter always sees a "style-less" input.

Orchestration runs on host once per song (a handful of device launches);
all signal math runs on device. Audio layout: ``[2, T]`` float32.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import NormalizationConfig
from ..ops.loudness import lufs_normalize
from .features import load_fx_features
from .imager import normalize_imager
from .matching import amp_to_db, comp_match, eq_match


class AudioEffectsNormalizer:
    """Per-stem FX normalization toward precomputed average features.

    EFFECTS order matters; inference uses
    ``['loudness','eq','compression','imager','loudness']``
    (reference ``style_transfer.py:372``).
    """

    def __init__(
        self,
        precomputed_feature_path: str,
        config: Optional[NormalizationConfig] = None,
    ):
        self.cfg = config or NormalizationConfig()
        self.features = load_fx_features(
            precomputed_feature_path, stems=self.cfg.stems
        )
        self._batched = None

    # ------------------------------------------------------------------
    def batched(self):
        """The (cached) batched/device-resident implementation."""
        if self._batched is None:
            from .batch import BatchedAudioEffectsNormalizer

            self._batched = BatchedAudioEffectsNormalizer(self.features, self.cfg)
        return self._batched

    def normalize_stems(self, stems) -> dict:
        """Batched multi-stem normalization: every stage runs ONCE for all
        stems' channels on device (see :mod:`.batch`). Same stage math as
        :meth:`normalize_audio`."""
        return self.batched().normalize_stems(stems)

    # ------------------------------------------------------------------
    def normalize_audio(self, audio: np.ndarray, src: str) -> np.ndarray:
        """Apply the configured chain of per-effect normalizations.

        Args:
            audio: ``[2, T]`` float32 stem.
            src: stem name in ``cfg.stems``.
        """
        assert src in self.cfg.stems, f"unknown stem {src}"
        out = np.asarray(audio, np.float32)
        for effect in self.cfg.effects:
            out = self.normalize_audio_per_effect(out, src, effect)
        return out

    # ------------------------------------------------------------------
    def normalize_audio_per_effect(
        self, audio: np.ndarray, src: str, effect: str
    ) -> np.ndarray:
        """One normalization stage (reference ``data_normalization.py:87-155``).

        The signal is FFT_SIZE zero-padded on both sides during processing
        and trimmed back, and the stage is skipped entirely when the stem
        peaks below MIN_DB.
        """
        cfg = self.cfg
        T = audio.shape[-1]
        x = np.pad(audio.astype(np.float32), ((0, 0), (cfg.fft_size, cfg.fft_size)))

        max_db = amp_to_db(np.max(np.abs(x)))
        if max_db <= cfg.min_db:
            return audio

        xj = jnp.asarray(x)
        if effect == "eq":
            chans = [
                eq_match(
                    xj[ch],
                    self.features["eq"][src],
                    sr=cfg.sample_rate,
                    n_fft=cfg.fft_size,
                    hop_length=cfg.hop_length,
                    min_db=cfg.min_db,
                    ntaps=cfg.ntaps,
                    lufs=cfg.lufs,
                )
                for ch in range(x.shape[0])
            ]
            y = jnp.stack(chans)
        elif effect == "compression":
            ref_peak, ref_std = self.features["compression"][src]
            attack, release, ratio, _n_mels = cfg.comp_settings[src]
            chans = []
            for ch in range(x.shape[0]):
                try:
                    matched = comp_match(
                        xj[ch],
                        float(ref_peak),
                        float(ref_std),
                        ratio,
                        attack,
                        release,
                        sr=cfg.sample_rate,
                        min_db=cfg.min_db,
                        comp_peak_norm=cfg.comp_peak_norm,
                        min_th=cfg.comp_min_th,
                        max_ratio=cfg.comp_max_ratio,
                        percentile=cfg.comp_percentile,
                        expander=cfg.comp_use_expander,
                    )
                    chans.append(matched)
                except Exception:
                    # reference swallows per-channel matching failures
                    # (data_normalization.py:120-139)
                    chans = None
                    break
            y = jnp.stack(chans) if chans is not None else xj
        elif effect == "loudness":
            target = float(np.asarray(self.features["loudness"][src]).reshape(-1)[0])
            # BS.1770 operates on [T, C]
            y = lufs_normalize(xj.T, cfg.sample_rate, target).T
        elif effect == "imager":
            mono_threshold = 0.99 if src == "bass" else 0.975
            y = normalize_imager(
                xj,
                target_side_mid_bal=float(self.features["imager"][src]),
                mono_threshold=mono_threshold,
                sr=cfg.sample_rate,
            )
        elif effect == "panning":
            # dataset-prep panning normalization (the inference feature file
            # carries no panning targets; requires features['panning'][src])
            from .matching import panning_match

            y = panning_match(
                xj, np.asarray(self.features["panning"][src]), sr=cfg.sample_rate
            )
        else:
            raise ValueError(f"unknown effect: {effect}")

        out = np.asarray(y)[:, cfg.fft_size : cfg.fft_size + T]
        return out

"""TPU-native music mixing style transfer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jhtonyKoo/music_mixing_style_transfer ("Music Mixing Style Transfer: A
Contrastive Learning Approach to Disentangle Audio Effects",
arXiv:2211.02247):

- ``models``:    FXencoder (contrastive audio-effects encoder) and
                 MixFXcloner (FiLM-conditioned TCN converter) as flax modules.
- ``ops``:       TPU DSP primitives — STFT/iSTFT, RBJ biquads as associative
                 scans, compressor envelope follower, FFT convolution,
                 BS.1770 loudness.
- ``fx``:        FXmanipulator — jittable, batched, PRNG-keyed audio-effects
                 augmentation chains (EQ/comp/pan/imager/reverb/gain/...).
- ``normalize``: audio-effects normalization (eq/comp/imager/loudness
                 matching against precomputed MUSDB18 features).
- ``losses``:    NT-Xent (mesh all-gather), multi-scale mid/side spectral,
                 RMS gain losses.
- ``data``:      WAV IO, segmentation, MUSDB manipulated datasets.
- ``train``:     pjit/shard_map training steps + orbax checkpointing.
- ``infer``:     style-transfer / feature-extraction pipelines and CLIs.
- ``parallel``:  device-mesh helpers and collectives.
"""

__version__ = "0.1.0"

SAMPLE_RATE = 44100
STEMS = ("drums", "bass", "other", "vocals")
EMBED_DIM = 2048

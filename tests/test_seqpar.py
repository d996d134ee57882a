"""Sequence-parallel converter: time-sharded forward == single-device forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
from music_mixing_style_transfer_tpu.infer.seqpar import (
    convert_seq_parallel,
    make_seq_parallel_converter,
    max_halo,
)
from music_mixing_style_transfer_tpu.models import MixFXcloner
from music_mixing_style_transfer_tpu.models.fast_init import fast_init
from music_mixing_style_transfer_tpu.parallel import create_mesh

TINY = TCNConfig(
    condition_dimension=16, nblocks=4, channel_width=8, kernel_size=7
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh(8)


def test_seq_parallel_matches_single_forward(mesh):
    cfg = TINY
    model = MixFXcloner(config=cfg, channels_last=True)
    rng = np.random.default_rng(0)
    B, T = 2, 8 * 512  # 512 per shard > max halo (k=7, d<=8 -> 24)
    assert 512 >= max_halo(cfg)
    x = (rng.standard_normal((B, 2, T)) * 0.3).astype(np.float32)
    cond = rng.standard_normal((B, cfg.condition_dimension)).astype(np.float32)
    variables = fast_init(model, jnp.zeros((1, 2, 1024)), jnp.zeros((1, cfg.condition_dimension)))

    ref = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(cond)))

    fn = make_seq_parallel_converter(cfg, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xd = jax.device_put(
        jnp.asarray(np.swapaxes(x, -1, -2)), NamedSharding(mesh, P(None, "data", None))
    )
    out = np.swapaxes(np.asarray(fn(variables, xd, jnp.asarray(cond))), -1, -2)
    err = np.max(np.abs(out - ref))
    assert err < 1e-5, f"seq-parallel diverges from single forward: {err}"


def test_engine_convert_seq_parallel(mesh):
    from music_mixing_style_transfer_tpu.infer.pipeline import StyleTransferEngine

    enc_cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
    )
    cfg = TCNConfig(
        condition_dimension=enc_cfg.embed_dim, nblocks=4, channel_width=8, kernel_size=7
    )
    eng = StyleTransferEngine(encoder_cfg=enc_cfg, converter_cfg=cfg, mesh=mesh)
    rng = np.random.default_rng(1)
    T = 8 * 700 + 13  # non-divisible: exercises padding + trim
    audio = (rng.standard_normal((2, T)) * 0.3).astype(np.float32)
    emb = rng.standard_normal((cfg.condition_dimension,)).astype(np.float32)

    out = convert_seq_parallel(eng, audio, emb)
    assert out.shape == (2, T)
    assert np.isfinite(out).all()

    # single-forward oracle on the same padded span
    model = MixFXcloner(config=cfg, channels_last=True)
    n_sh = eng._n_shards
    T_loc = max(-(-T // n_sh), max_halo(cfg))
    xb = np.pad(audio, ((0, 0), (0, T_loc * n_sh - T)))[None]
    ref = np.asarray(
        model.apply(eng.conv_vars, jnp.asarray(xb), jnp.asarray(emb)[None])
    )[0, :, :T]
    assert np.max(np.abs(out - ref)) < 1e-5


def test_pcm_path_sequence_parallel_matches_segments(mesh):
    """With a one-segment song (no boundaries to remove), the PCM fast path
    under sequence_parallel=True must match the segment-batched conversion
    to int16 quantization."""
    import dataclasses

    from music_mixing_style_transfer_tpu.config import InferenceConfig
    from music_mixing_style_transfer_tpu.infer.pipeline import (
        MixingStyleTransfer,
        StyleTransferEngine,
    )

    enc_cfg = FXencoderConfig(
        channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1)
    )
    cfg = TCNConfig(
        condition_dimension=enc_cfg.embed_dim, nblocks=4, channel_width=8, kernel_size=7
    )
    eng = StyleTransferEngine(encoder_cfg=enc_cfg, converter_cfg=cfg, mesh=mesh)
    T = 8 * 512  # == segment_length and == n_shards * T_loc
    assert T // 8 >= max_halo(cfg)
    icfg = InferenceConfig(
        segment_length=T, segment_length_ref=T, normalize_input=False
    )
    rng = np.random.default_rng(5)
    pcm = lambda: (rng.standard_normal((4, 2, T)) * 8000).astype(np.int16)
    inp, ref = pcm(), pcm()

    seg_pipe = MixingStyleTransfer(eng, icfg)
    mix_seg, _ = seg_pipe.transfer_song_pcm(inp, ref)
    sp_pipe = MixingStyleTransfer(
        eng, dataclasses.replace(icfg, sequence_parallel=True)
    )
    mix_sp, _ = sp_pipe.transfer_song_pcm(inp, ref)
    assert mix_sp.shape == mix_seg.shape == (2, T)
    # identical forward modulo conv-split reduction order -> <=1 LSB int16
    diff = np.abs(mix_sp.astype(np.int32) - mix_seg.astype(np.int32))
    assert diff.max() <= 1, f"max int16 delta {diff.max()}"

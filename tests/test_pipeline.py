"""End-to-end inference pipeline tests (small models, synthetic stems)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.config import (
    FXencoderConfig,
    InferenceConfig,
    TCNConfig,
)
from music_mixing_style_transfer_tpu.data import (
    read_wav,
    reassemble_song,
    segment_song,
    write_wav,
)
from music_mixing_style_transfer_tpu.infer.pipeline import (
    MixingStyleTransfer,
    StyleTransferEngine,
)

SR = 44100
SMALL_ENC = FXencoderConfig(
    channels=(8, 16, 32), kernels=(25, 15, 5), strides=(4, 2, 2), dilation=(1, 1, 1)
)
SMALL_TCN = TCNConfig(condition_dimension=32, nblocks=4, channel_width=16, kernel_size=15)


@pytest.fixture(scope="module")
def engine():
    return StyleTransferEngine(encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN)


def test_wav_roundtrip(tmp_path, rng):
    x = np.clip(rng.standard_normal((1000, 2)) * 0.4, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, SR)
    y, rate = read_wav(path)
    assert rate == SR
    np.testing.assert_allclose(y, x, atol=1.0 / 2**14)


def test_segment_reassemble_roundtrip(rng):
    x = (rng.standard_normal((2, 10_000)) * 0.3).astype(np.float32)
    segs, T = segment_song(x, 4096)
    assert segs.shape == (3, 2, 4096)
    y = reassemble_song(segs, T)
    np.testing.assert_allclose(y, x)


def test_embed_song_shapes(engine, rng):
    audio = (rng.standard_normal((2, 3 * 8192)) * 0.2).astype(np.float32)
    emb = engine.embed_song(audio, segment_length=8192)
    assert emb.shape == (SMALL_ENC.embed_dim,)
    assert np.isfinite(emb).all()


def test_embed_mask_excludes_batch_padding(engine, rng):
    """Bucket padding must not change the mean embedding."""
    audio = (rng.standard_normal((2, 3 * 8192)) * 0.2).astype(np.float32)
    emb3 = engine.embed_song(audio, segment_length=8192)  # 3 segments -> bucket 4
    # manually: mean of per-segment embeddings
    segs, _ = segment_song(audio, 8192)
    embs = []
    for s in segs:
        e = engine._encode_mean(
            engine.enc_vars,
            jnp.asarray(s[None]),
            jnp.asarray(np.array([True])),
        )
        embs.append(np.asarray(e))
    np.testing.assert_allclose(emb3, np.mean(embs, axis=0), rtol=2e-3, atol=2e-5)


def test_convert_song_preserves_length(engine, rng):
    audio = (rng.standard_normal((2, 20_000)) * 0.2).astype(np.float32)
    emb = np.zeros(SMALL_TCN.condition_dimension, np.float32)
    y = engine.convert_song(audio, emb, segment_length=8192)
    assert y.shape == audio.shape
    assert np.isfinite(y).all()
    assert np.abs(y).max() <= 1.0


def test_interpolated_conversion(engine, rng):
    audio = (rng.standard_normal((2, 30_000)) * 0.2).astype(np.float32)
    emb_a = rng.standard_normal(SMALL_TCN.condition_dimension).astype(np.float32)
    emb_b = rng.standard_normal(SMALL_TCN.condition_dimension).astype(np.float32)
    y = engine.convert_song_interpolated(audio, emb_a, emb_b, n_chunks=5)
    assert y.shape == audio.shape
    assert np.isfinite(y).all()


def test_full_directory_pipeline(engine, tmp_path, rng):
    """Directory contract: <song>/separated/<model>/<input|reference>/<inst>.wav"""
    cfg = InferenceConfig(
        segment_length=8192,
        segment_length_ref=8192,
        normalize_input=False,
        save_each_inst=True,
        do_not_separate=True,  # use 'separated/' directly, no demucs
        stem_level_directory_name="separated",
    )
    target = tmp_path / "songs"
    for name in ["input", "reference"]:
        for inst in cfg.instruments:
            x = (rng.standard_normal((12_000, 2)) * 0.2).astype(np.float32)
            write_wav(str(target / "song1" / "separated" / name / f"{inst}.wav"), x, SR)

    pipeline = MixingStyleTransfer(engine, cfg)
    written = pipeline.run_directory(str(target) + "/")
    assert len(written) == 1
    mix, rate = read_wav(written[0])
    assert rate == SR
    assert mix.shape[0] == 12_000
    for inst in cfg.instruments:
        assert os.path.exists(str(target / "song1" / f"{inst}_output_notnormed.wav"))


def test_load_config_yaml():
    import os
    from music_mixing_style_transfer_tpu.config import load_config

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "music_mixing_style_transfer_tpu",
        "configs.yaml",
    )
    cfg = load_config(path)
    assert cfg.encoder.channels[-1] == 2048
    assert cfg.converter.nblocks == 14
    assert cfg.inference.segment_length == 2**19
    cfg2 = load_config(path, overrides={"converter": {"nblocks": 4}})
    assert cfg2.converter.nblocks == 4


def test_interpolation_directory_pipeline(engine, tmp_path, rng):
    cfg = InferenceConfig(
        segment_length=8192,
        segment_length_ref=8192,
        normalize_input=False,
        do_not_separate=True,
        interpolation=True,
        interpolate_segments=4,
    )
    target = tmp_path / "songs"
    for name in ["input", "reference", "reference_B"]:
        for inst in cfg.instruments:
            x = (rng.standard_normal((20_000, 2)) * 0.2).astype(np.float32)
            write_wav(str(target / "s" / "separated" / name / f"{inst}.wav"), x, SR)
    pipeline = MixingStyleTransfer(engine, cfg)
    written = pipeline.run_directory(str(target) + "/")
    assert len(written) == 1
    assert "interpolation" in written[0]
    mix, _ = read_wav(written[0])
    assert mix.shape[0] == 20_000


def test_expander_factory(rng):
    import jax
    import jax.numpy as jnp
    from music_mixing_style_transfer_tpu.fx.factory import create_effects_augmentation_chain

    chain = create_effects_augmentation_chain([("expander", 1.0)])
    x = jnp.asarray((rng.standard_normal((1, 2, 4096)) * 0.3).astype(np.float32))
    y = np.asarray(chain(jax.random.PRNGKey(0), x))
    assert np.isfinite(y).all()


def test_convert_song_halo_removes_boundary_seams(engine, rng):
    """With halo context, segment boundaries must match the unsegmented
    forward; without halo they generally don't (zero context across cuts)."""
    seg = 8192
    audio = (rng.standard_normal((2, 3 * seg)) * 0.2).astype(np.float32)
    emb = rng.standard_normal(SMALL_TCN.condition_dimension).astype(np.float32)

    # unsegmented ground truth: one segment spanning everything
    full = engine.convert_song(audio, emb, segment_length=3 * seg)
    halo = engine.convert_song(audio, emb, segment_length=seg, halo=2048)
    plain = engine.convert_song(audio, emb, segment_length=seg)

    # compare a window around an interior boundary
    b = seg
    w = slice(b - 256, b + 256)
    err_halo = np.max(np.abs(halo[:, w] - full[:, w]))
    err_plain = np.max(np.abs(plain[:, w] - full[:, w]))
    assert err_halo < err_plain
    # small TCN receptive field (~1.8k samples) fits in the 2048 halo ->
    # the haloed output should essentially equal the unsegmented one
    assert err_halo < 1e-4


def test_batched_transfer_with_halo(engine, tmp_path, rng):
    cfg = InferenceConfig(
        segment_length=8192, segment_length_ref=8192,
        normalize_input=False, do_not_separate=True, segment_halo=1024,
    )
    target = tmp_path / "songs"
    for name in ["input", "reference"]:
        for inst in cfg.instruments:
            x = (rng.standard_normal((20_000, 2)) * 0.2).astype(np.float32)
            write_wav(str(target / "h" / "separated" / name / f"{inst}.wav"), x, SR)
    pipeline = MixingStyleTransfer(engine, cfg)
    written = pipeline.run_directory(str(target) + "/")
    mix, _ = read_wav(written[0])
    assert mix.shape[0] == 20_000
    assert np.isfinite(mix).all()


def test_cli_arg_wiring():
    """CLI args map onto InferenceConfig (catches misplaced kwargs)."""
    from music_mixing_style_transfer_tpu.infer.style_transfer import (
        build_parser,
        config_from_args,
    )

    args = build_parser().parse_args(
        [
            "--segment_length", "8192", "--do_not_separate", "true",
            "--interpolation", "true", "--segment_halo", "512",
            "--dtype", "bfloat16", "--normalize_input", "false",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.segment_length == 8192
    assert cfg.do_not_separate and cfg.interpolation
    assert cfg.segment_halo == 512
    assert cfg.dtype == "bfloat16"
    assert not cfg.normalize_input


def test_mesh_sharded_inference_matches_single(rng):
    """Engine with a 4-device mesh == single-device engine (params replicated,
    segment batch sharded over 'data')."""
    from music_mixing_style_transfer_tpu.parallel import create_mesh

    e_single = StyleTransferEngine(encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN, seed=7)
    e_mesh = StyleTransferEngine(
        encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN, seed=7, mesh=create_mesh(4)
    )
    audio = (rng.standard_normal((2, 5 * 8192)) * 0.2).astype(np.float32)
    ref = (rng.standard_normal((2, 3 * 8192)) * 0.2).astype(np.float32)

    emb1 = e_single.embed_song(ref, 8192)
    emb2 = e_mesh.embed_song(ref, 8192)
    np.testing.assert_allclose(emb1, emb2, rtol=1e-4, atol=1e-5)

    y1 = e_single.convert_song(audio, emb1, 8192)
    y2 = e_mesh.convert_song(audio, emb2, 8192)
    np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-5)


def test_engine_loads_trainer_checkpoint(tmp_path, rng):
    """StyleTransferEngine must serve checkpoints saved by the trainers
    (orbax CheckpointManager dirs), not only torch .pt files."""
    from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
    from music_mixing_style_transfer_tpu.infer.pipeline import StyleTransferEngine
    from music_mixing_style_transfer_tpu.models.checkpoints import load_model_variables
    from music_mixing_style_transfer_tpu.train import CheckpointManager, init_contrastive

    enc_cfg = FXencoderConfig(channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1))
    enc, state, tx = init_contrastive(enc_cfg, example_length=4096)
    d = str(tmp_path / "ckpt")
    CheckpointManager(d, keep=2).save(5, state)

    vars_ = load_model_variables(d, "fxencoder")
    leaf = jax.tree.leaves(vars_["params"])[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(jax.tree.leaves(state.params)[0]))

    tcn_cfg = TCNConfig(condition_dimension=enc_cfg.embed_dim, nblocks=2, channel_width=8, kernel_size=7)
    eng = StyleTransferEngine(
        ckpt_path_enc=d, encoder_cfg=enc_cfg, converter_cfg=tcn_cfg
    )
    audio = (rng.standard_normal((2, 8192)) * 0.2).astype(np.float32)
    emb = eng.embed_song(audio, 4096)
    assert emb.shape == (enc_cfg.embed_dim,) and np.isfinite(emb).all()


def test_checkpoint_loader_rejects_garbage(tmp_path):
    from music_mixing_style_transfer_tpu.models.checkpoints import load_model_variables

    empty = tmp_path / "empty"
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        load_model_variables(str(empty), "fxencoder")


def test_short_reference_encoded_whole(rng):
    """Stems <= 2x segment length are embedded WHOLE (reference
    style_transfer.py:133) — not zero-padded into a mostly-silent second
    segment that dilutes the mean embedding."""
    from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
    from music_mixing_style_transfer_tpu.infer.pipeline import StyleTransferEngine

    enc_cfg = FXencoderConfig(channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1))
    tcn_cfg = TCNConfig(condition_dimension=enc_cfg.embed_dim, nblocks=2, channel_width=8, kernel_size=7)
    eng = StyleTransferEngine(encoder_cfg=enc_cfg, converter_cfg=tcn_cfg)
    seg = 8192
    T = int(1.5 * seg)
    audio = (rng.standard_normal((2, T)) * 0.2).astype(np.float32)

    got = eng.embed_song(audio, seg)
    # expected: one whole-stem forward, bucketed to 4096
    Tb = -(-T // 4096) * 4096
    whole = np.pad(audio, ((0, 0), (0, Tb - T)))[None]
    want = np.asarray(
        eng._encode_mean(
            eng.enc_vars, jnp.asarray(whole), jnp.asarray(np.ones(1, bool))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # long stems still segmentize
    long_audio = (rng.standard_normal((2, 3 * seg)) * 0.2).astype(np.float32)
    e_long = eng.embed_song(long_audio, seg)
    assert e_long.shape == got.shape and np.isfinite(e_long).all()


def test_transfer_song_pcm_matches_host_paths(engine, rng):
    """Device-resident PCM path == host per-stage path, for both the plain
    and the interpolation modes (same math, one dispatch, int16 output
    quantization is the only difference)."""
    cfg = InferenceConfig(
        segment_length=8192, segment_length_ref=8192, interpolate_segments=4
    )
    pipe = MixingStyleTransfer(engine, cfg, normalizer=None)
    T = 3 * 8192 + 1000  # ragged length exercises the padding paths

    def mk_pcm():
        return (rng.standard_normal((4, 2, T)) * 8000.0).astype(np.int16)

    in_pcm, ref_pcm, ref_b_pcm = mk_pcm(), mk_pcm(), mk_pcm()
    to_f = lambda pcm: {
        inst: pcm[s].astype(np.float32) / 32768.0
        for s, inst in enumerate(cfg.instruments)
    }
    in_f, ref_f, ref_b_f = to_f(in_pcm), to_f(ref_pcm), to_f(ref_b_pcm)

    def nrmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12))

    # plain mode
    mix_pcm, stems = pipe.transfer_song_pcm(in_pcm, ref_pcm, want_stems=True)
    mix_host, outs = pipe.transfer_stems(in_f, ref_f)
    assert mix_pcm.shape == (2, T) and mix_pcm.dtype == np.int16
    assert nrmse(mix_pcm.astype(np.float32) / 32768.0, mix_host) < 1e-3
    for inst in cfg.instruments:
        assert nrmse(stems[inst].astype(np.float32) / 32768.0, outs[inst]) < 1e-3

    # interpolation mode
    mix_pcm_i, _ = pipe.transfer_song_pcm(
        in_pcm, ref_pcm, reference_pcm_b=ref_b_pcm
    )
    mix_host_i, _ = pipe.transfer_stems(in_f, ref_f, ref_b_f)
    assert mix_pcm_i.shape == (2, T)
    assert nrmse(mix_pcm_i.astype(np.float32) / 32768.0, mix_host_i) < 1e-3
    # the two modes must actually differ (interpolation conditions on B too)
    assert nrmse(mix_pcm_i.astype(np.float32), mix_pcm.astype(np.float32)) > 1e-4


def test_transfer_song_pcm_accepts_float32(engine, rng):
    """float32 stem stacks (24/32-bit or float WAV sources) take the same
    device-resident stages: output must equal the int16 run bit-exactly
    (int16/32768 IS the float32 the fallback would produce)."""
    cfg = InferenceConfig(segment_length=8192, segment_length_ref=8192)
    pipe = MixingStyleTransfer(engine, cfg, normalizer=None)
    T = 2 * 8192 + 777

    def mk_pcm():
        return (rng.standard_normal((4, 2, T)) * 8000.0).astype(np.int16)

    in_pcm, ref_pcm = mk_pcm(), mk_pcm()
    to_f32 = lambda p: p.astype(np.float32) / 32768.0
    mix_i16, _ = pipe.transfer_song_pcm(in_pcm, ref_pcm)
    mix_f32, _ = pipe.transfer_song_pcm(to_f32(in_pcm), to_f32(ref_pcm))
    np.testing.assert_array_equal(mix_i16, mix_f32)

    # mixed dtypes (int16 input, float32 reference) work too
    mix_mixed, _ = pipe.transfer_song_pcm(in_pcm, to_f32(ref_pcm))
    np.testing.assert_array_equal(mix_i16, mix_mixed)

    with pytest.raises(ValueError, match="int16 or float32"):
        pipe.transfer_song_pcm(in_pcm.astype(np.int32), ref_pcm)


def test_run_directory_float_sources_stay_on_fast_path(engine, tmp_path, rng, caplog):
    """32-bit WAV stems route through the device-resident path (float32
    upload) instead of the per-stage host fallback."""
    import wave as wave_mod

    cfg = InferenceConfig(
        segment_length=8192,
        segment_length_ref=8192,
        normalize_input=False,
        do_not_separate=True,
    )
    target = tmp_path / "songs"
    T = 11_000
    for name in ["input", "reference"]:
        for inst in cfg.instruments:
            x = (rng.standard_normal((T, 2)) * 0.2).astype(np.float32)
            path = target / "songA" / "separated" / name / f"{inst}.wav"
            os.makedirs(path.parent, exist_ok=True)
            pcm32 = np.clip(np.round(x * 2.0**31), -(2.0**31), 2.0**31 - 1).astype("<i4")
            with wave_mod.open(str(path), "w") as w:
                w.setnchannels(2)
                w.setsampwidth(4)
                w.setframerate(SR)
                w.writeframes(pcm32.tobytes())

    pipeline = MixingStyleTransfer(engine, cfg)
    import logging

    with caplog.at_level(logging.INFO):
        written = pipeline.run_directory(str(target) + "/")
    assert len(written) == 1
    mix, rate = read_wav(written[0])
    assert rate == SR and mix.shape[0] == T and np.isfinite(mix).all()
    # the device-resident dispatch ran (no "pcm fast path unavailable" fallback)
    msgs = " ".join(r.message for r in caplog.records)
    assert "pcm fast path unavailable" not in msgs


def test_run_directory_multi_song_pipelined(engine, tmp_path, rng):
    """Multiple songs drain correctly through the 2-song software pipeline
    (song i+1's host I/O overlaps song i's in-flight device work)."""
    cfg = InferenceConfig(
        segment_length=8192,
        segment_length_ref=8192,
        normalize_input=False,
        do_not_separate=True,
        stem_level_directory_name="separated",
    )
    target = tmp_path / "songs"
    lengths = {"songA": 11_000, "songB": 19_000, "songC": 9_000}
    for song, T in lengths.items():
        for name in ["input", "reference"]:
            for inst in cfg.instruments:
                x = (rng.standard_normal((T, 2)) * 0.2).astype(np.float32)
                write_wav(str(target / song / "separated" / name / f"{inst}.wav"), x, SR)

    pipeline = MixingStyleTransfer(engine, cfg)
    written = pipeline.run_directory(str(target) + "/")
    assert len(written) == 3
    for path, (song, T) in zip(written, sorted(lengths.items())):
        assert song in path
        mix, rate = read_wav(path)
        assert rate == SR and mix.shape[0] == T
        assert np.isfinite(mix).all() and np.abs(mix).max() > 0


def test_run_directory_unequal_stems_stay_on_fast_path(engine, tmp_path, rng, caplog):
    """Stems of DIFFERENT lengths within one song take the device-resident
    fast path (host-padded to the max stem length in _load_song_pcm, like
    the reference tolerates arbitrary stem lengths, loader_utils.py:47-70)
    instead of dropping to the 6.7x-slower per-stage host route."""
    cfg = InferenceConfig(
        segment_length=8192,
        segment_length_ref=8192,
        normalize_input=False,
        do_not_separate=True,
    )
    target = tmp_path / "songs_uneq"
    lengths = {"drums": 9_000, "bass": 12_000, "other": 11_000, "vocals": 7_500}
    for name in ["input", "reference"]:
        for inst in cfg.instruments:
            T = lengths[inst] + (500 if name == "reference" else 0)
            x = (rng.standard_normal((T, 2)) * 0.2).astype(np.float32)
            path = target / "songU" / "separated" / name / f"{inst}.wav"
            os.makedirs(path.parent, exist_ok=True)
            write_wav(str(path), x, SR)

    pipeline = MixingStyleTransfer(engine, cfg)
    import logging

    with caplog.at_level(logging.INFO):
        written = pipeline.run_directory(str(target) + "/")
    assert len(written) == 1
    mix, rate = read_wav(written[0])
    # output spans the longest input stem
    assert rate == SR and mix.shape[0] == max(lengths.values())
    assert np.isfinite(mix).all() and np.abs(mix).max() > 1e-5
    msgs = " ".join(r.message for r in caplog.records)
    assert "pcm fast path unavailable" not in msgs
    assert "host path" not in msgs

"""End-to-end training loop smoke tests on synthetic MUSDB data."""
import os

import numpy as np
import pytest

import jax

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig, TrainConfig
from music_mixing_style_transfer_tpu.data import write_wav
from music_mixing_style_transfer_tpu.train.loop import (
    schedule_probs,
    train_converter,
    train_fxencoder,
)

SR = 44100
SEG = 2**13
INSTS = ("drums", "bass", "other", "vocals")

SMALL_ENC = FXencoderConfig(channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1))
SMALL_TCN = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=7)


@pytest.fixture(scope="module")
def musdb_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("musdb_train")
    rng = np.random.default_rng(0)
    for mode in ("train", "val"):
        d = root / mode
        d.mkdir(exist_ok=True)
        for inst in INSTS:
            x = (rng.standard_normal((SEG * 4, 2)) * 0.2).astype(np.float32)
            write_wav(str(d / f"{inst}_normalized_eqcompimagegain_silence_trimmed0.wav"), x, SR)
    return str(root)


def test_schedule_probs():
    init = {"eq": 0.9, "comp": 0.9}
    tgt = {"eq": 0.1}
    assert schedule_probs(init, tgt, 0, 5)["eq"] == 0.9
    assert abs(schedule_probs(init, tgt, 4, 5)["eq"] - 0.1) < 1e-9
    assert schedule_probs(init, tgt, 4, 5)["comp"] == 0.9  # unscheduled key fixed


def test_train_fxencoder_loop(musdb_dir, tmp_path):
    tcfg = TrainConfig(segment_length=SEG, num_strong_negatives=1)
    # small encoder via encoder_cfg; single device (CPU mesh has 8, use mesh)
    state = train_fxencoder(
        musdb_dir,
        str(tmp_path / "run"),
        encoder_cfg=FXencoderConfig(
            channels=SMALL_ENC.channels,
            kernels=SMALL_ENC.kernels,
            strides=SMALL_ENC.strides,
            dilation=SMALL_ENC.dilation,
        ),
        train_cfg=tcfg,
        epochs=2,
        steps_per_epoch=2,
        batch_items=2,
        prob_schedule_target={"eq": 0.5},
        use_mesh=False,
    )
    assert int(state.step) == 4
    # checkpoint written + resume works
    assert os.path.isdir(str(tmp_path / "run" / "ckpt"))
    state2 = train_fxencoder(
        musdb_dir,
        str(tmp_path / "run"),
        encoder_cfg=FXencoderConfig(
            channels=SMALL_ENC.channels,
            kernels=SMALL_ENC.kernels,
            strides=SMALL_ENC.strides,
            dilation=SMALL_ENC.dilation,
        ),
        train_cfg=tcfg,
        epochs=2,
        steps_per_epoch=2,
        batch_items=2,
        use_mesh=False,
    )  # already at epoch 2 -> resumes and does nothing
    assert int(state2.step) == 4


def test_train_converter_loop(musdb_dir, tmp_path):
    from music_mixing_style_transfer_tpu.models import FXencoder
    import jax.numpy as jnp

    enc = FXencoder(config=SMALL_ENC)
    enc_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, SEG)))
    tcfg = TrainConfig(segment_length=SEG)
    state = train_converter(
        musdb_dir,
        str(tmp_path / "runc"),
        enc_vars,
        encoder_cfg=SMALL_ENC,
        converter_cfg=TCNConfig(
            condition_dimension=SMALL_ENC.channels[-1],
            nblocks=SMALL_TCN.nblocks,
            channel_width=SMALL_TCN.channel_width,
            kernel_size=SMALL_TCN.kernel_size,
        ),
        train_cfg=tcfg,
        epochs=1,
        steps_per_epoch=2,
        batch_items=1,
        use_mesh=False,
    )
    assert int(state.step) == 2


def test_convert_ckpt_cli(tmp_path, rng):
    """Torch -> orbax conversion CLI roundtrip on a small oracle checkpoint."""
    import sys
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracles import OracleTCN

    oracle = OracleTCN(nblocks=2, k=3, width=8, cond_dim=16, stack=15)
    sd = {}
    for n, blk in enumerate(oracle.blocks):
        sd[f"module.blocks.{n}.conv1.weight"] = blk.conv1.weight
        sd[f"module.blocks.{n}.bn.weight"] = blk.bn.weight
        sd[f"module.blocks.{n}.bn.bias"] = blk.bn.bias
        sd[f"module.blocks.{n}.bn.running_mean"] = blk.bn.running_mean
        sd[f"module.blocks.{n}.bn.running_var"] = blk.bn.running_var
        sd[f"module.blocks.{n}.film.film_fc.weight"] = blk.film.fc.weight
        sd[f"module.blocks.{n}.film.film_fc.bias"] = blk.film.fc.bias
        sd[f"module.blocks.{n}.res.weight"] = blk.res.weight
    sd["module.output.weight"] = oracle.output.weight
    sd["module.output.bias"] = oracle.output.bias
    pt = str(tmp_path / "MixFXcloner_small.pt")
    torch.save({"model": sd}, pt)

    # monkeypatch the expected block count via a custom conversion
    from music_mixing_style_transfer_tpu.models.torch_import import mixfxcloner_from_torch
    from music_mixing_style_transfer_tpu.models.convert_ckpt import load_orbax_variables
    import orbax.checkpoint as ocp

    variables = mixfxcloner_from_torch(torch.load(pt, weights_only=False)["model"], n_blocks=2)
    out = str(tmp_path / "converted")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(out, "variables"), variables, force=True)
    ckptr.wait_until_finished()
    restored = load_orbax_variables(out)
    a = jax.tree.leaves(variables)[0]
    b = jax.tree.leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_batch_prefetcher_order_and_errors():
    from music_mixing_style_transfer_tpu.data.prefetch import BatchPrefetcher

    out = list(BatchPrefetcher(lambda i: i * i, 5))
    assert out == [0, 1, 4, 9, 16]

    def boom(i):
        if i == 2:
            raise ValueError("boom")
        return i

    got = []
    with pytest.raises(ValueError):
        for v in BatchPrefetcher(boom, 5):
            got.append(v)
    assert got == [0, 1]


def test_transient_retry_classifier(monkeypatch):
    """train.cli re-execs ONLY on transient backend failures, bounded by the
    retry budget; real errors re-raise immediately (SURVEY.md §5.3)."""
    from jax.errors import JaxRuntimeError

    from music_mixing_style_transfer_tpu.train import cli

    calls = []
    monkeypatch.setattr(cli.os, "execv", lambda *a: calls.append(a))
    monkeypatch.delenv(cli._RETRY_ENV, raising=False)

    # non-transient: re-raise untouched, no exec
    with pytest.raises(ValueError):
        cli._maybe_reexec_on_transient(ValueError("NaN loss"), max_retries=3)
    # transient JaxRuntimeError within budget: re-exec (counter advances)
    err = JaxRuntimeError("INTERNAL: remote_compile: connection dropped")
    cli._maybe_reexec_on_transient(err, max_retries=2)
    assert len(calls) == 1 and os.environ[cli._RETRY_ENV] == "1"
    cli._maybe_reexec_on_transient(err, max_retries=2)
    assert len(calls) == 2 and os.environ[cli._RETRY_ENV] == "2"
    # budget exhausted: the transient error finally surfaces
    with pytest.raises(JaxRuntimeError):
        cli._maybe_reexec_on_transient(err, max_retries=2)
    assert len(calls) == 2
    monkeypatch.delenv(cli._RETRY_ENV, raising=False)

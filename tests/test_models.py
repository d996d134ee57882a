"""Model parity tests: JAX FXencoder / MixFXcloner vs torch oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
from music_mixing_style_transfer_tpu.models import FXencoder, MixFXcloner

from torch_oracles import (
    OracleFXencoder,
    OracleTCN,
    fxencoder_state_to_jax,
    tcn_state_to_jax,
)

# small configs for fast CPU tests (full-size parity covered by param-count tests)
SMALL_ENC = FXencoderConfig(
    channels=(8, 16, 32), kernels=(25, 15, 5), strides=(4, 2, 2), dilation=(1, 1, 1)
)
SMALL_TCN = TCNConfig(condition_dimension=32, nblocks=4, channel_width=16, kernel_size=15)


def test_fxencoder_param_count():
    enc = FXencoder()
    shapes = jax.eval_shape(
        lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8192)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    assert n == 81_392_682  # SURVEY.md §2.4: ~81.4M


def test_tcn_param_count_and_receptive_field():
    tcn = MixFXcloner()
    shapes = jax.eval_shape(
        lambda: tcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4096)), jnp.zeros((1, 2048)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    assert n == 10_547_970  # SURVEY.md §2.4: ~10.5M
    assert TCNConfig().receptive_field() == 229_363  # 5.2 s @ 44.1 kHz


def test_fxencoder_matches_torch_oracle(rng):
    torch.manual_seed(0)
    oracle = OracleFXencoder(SMALL_ENC.channels, SMALL_ENC.kernels, SMALL_ENC.strides)
    oracle.eval()
    # randomize BN stats so eval-mode normalization is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    x = rng.standard_normal((3, 2, 4096)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    model = FXencoder(config=SMALL_ENC)
    variables = fxencoder_state_to_jax(oracle)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tcn_matches_torch_oracle(rng):
    torch.manual_seed(1)
    oracle = OracleTCN(
        nblocks=SMALL_TCN.nblocks,
        k=SMALL_TCN.kernel_size,
        width=SMALL_TCN.channel_width,
        cond_dim=SMALL_TCN.condition_dimension,
        stack=SMALL_TCN.stack_size,
    )
    oracle.eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    x = (rng.standard_normal((2, 2, 2048)) * 0.1).astype(np.float32)
    cond = rng.standard_normal((2, SMALL_TCN.condition_dimension)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(cond)).numpy()

    model = MixFXcloner(config=SMALL_TCN)
    variables = tcn_state_to_jax(oracle)
    out = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(cond)))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_torch_import_roundtrip(rng):
    """mixfxcloner_from_torch maps oracle state_dict names onto our pytree."""
    from music_mixing_style_transfer_tpu.models.torch_import import (
        fxencoder_from_torch,
        mixfxcloner_from_torch,
    )

    torch.manual_seed(2)
    oracle = OracleTCN(nblocks=2, k=3, width=8, cond_dim=16, stack=15)
    # rename oracle keys to the reference checkpoint naming
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

    variables = mixfxcloner_from_torch(sd, n_blocks=2)
    cfg = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=3)
    model = MixFXcloner(config=cfg)
    x = (rng.standard_normal((1, 2, 256)) * 0.1).astype(np.float32)
    cond = rng.standard_normal((1, 16)).astype(np.float32)
    oracle.eval()
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(cond)).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # FXencoder naming path
    enc_oracle = OracleFXencoder((4, 8), (5, 5), (2, 2))
    sd2 = {}
    for i, blk in enumerate(enc_oracle.blocks):
        for cname, conv in (("conv1", blk.conv1), ("conv2", blk.conv2)):
            base = f"module.encoder.{i}.{cname}.conv1d"
            sd2[f"{base}.conv1d.weight"] = conv.conv.weight
            sd2[f"{base}.conv1d.bias"] = conv.conv.bias
            sd2[f"{base}.batch_norm.weight"] = conv.bn.weight
            sd2[f"{base}.batch_norm.bias"] = conv.bn.bias
            sd2[f"{base}.batch_norm.running_mean"] = conv.bn.running_mean
            sd2[f"{base}.batch_norm.running_var"] = conv.bn.running_var
    variables2 = fxencoder_from_torch(sd2, n_blocks=2)
    cfg2 = FXencoderConfig(channels=(4, 8), kernels=(5, 5), strides=(2, 2), dilation=(1, 1))
    enc = FXencoder(config=cfg2)
    xe = rng.standard_normal((1, 2, 512)).astype(np.float32)
    enc_oracle.eval()
    with torch.no_grad():
        ref2 = enc_oracle(torch.from_numpy(xe)).numpy()
    out2 = np.asarray(enc.apply(variables2, jnp.asarray(xe)))
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-6)


def test_fast_init_is_stable(rng):
    """fast_init must produce finite activations (BN var strictly positive)."""
    import jax.numpy as jnp
    from music_mixing_style_transfer_tpu.models.fast_init import fast_init

    enc = FXencoder(config=SMALL_ENC)
    v = fast_init(enc, jnp.zeros((1, 2, 4096)))
    # BN running vars all ones
    for leaf_path, leaf in jax.tree_util.tree_flatten_with_path(v["batch_stats"])[0]:
        assert (np.asarray(leaf) >= 0).all()
    x = jnp.asarray((rng.standard_normal((2, 2, 4096)) * 0.3).astype(np.float32))
    out = np.asarray(enc.apply(v, x))
    assert np.isfinite(out).all()


def test_tcn_channels_last_matches_nch(rng):
    """The NHWC-folded channels-last path (TPU-fast) and the NCH path are
    the same function of the same params, including causal and non-divisible
    segment lengths."""
    for causal, T in [(False, 10000), (True, 10000), (False, 4096)]:
        cfg = TCNConfig(
            condition_dimension=32, nblocks=5, channel_width=16, kernel_size=15,
            causal=causal,
        )
        nch = MixFXcloner(config=cfg, channels_last=False)
        nhc = MixFXcloner(config=cfg, channels_last=True)
        v = nch.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 4096)), jnp.zeros((1, 32))
        )
        x = jnp.asarray((rng.standard_normal((2, 2, T)) * 0.1).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
        a = nch.apply(v, x, c)
        b = nhc.apply(v, x, c)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batchnorm_train_stats_f32_under_bf16(rng):
    """bf16 activations with |mean| >> std: the E[x^2]-E[x]^2 variance must
    be computed in f32 — in bf16 it cancels catastrophically (var <= 0 ->
    rsqrt NaN). Running stats stay f32-valued."""
    from music_mixing_style_transfer_tpu.models.blocks import BatchNorm1d

    bn = BatchNorm1d(4, use_running_average=False)
    # mean/std ratio representable in bf16 but fatal for bf16 E[x^2]-E[x]^2
    x32 = (8.0 + 0.5 * rng.standard_normal((8, 4, 256))).astype(np.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x32))
    x16 = jnp.asarray(x32).astype(jnp.bfloat16)
    y16, upd = bn.apply(variables, x16, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y16, np.float32)).all()
    var = np.asarray(upd["batch_stats"]["var"])
    assert var.dtype == np.float32 and (var > 0).all()
    # agree with the all-f32 pass up to input quantization noise
    y32, _ = bn.apply(variables, jnp.asarray(x32), mutable=["batch_stats"])
    assert np.abs(np.asarray(y16, np.float32) - np.asarray(y32)).mean() < 0.2

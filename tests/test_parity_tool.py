"""Parity-check harness test: synthesize small reference-format checkpoints
and verify the tool reports near-perfect agreement."""
import numpy as np
import pytest
import torch

from music_mixing_style_transfer_tpu.tools.parity_check import (
    torch_fxencoder_forward,
    torch_mixfxcloner_forward,
)

from torch_oracles import OracleFXencoder, OracleTCN


def test_functional_torch_encoder_matches_module(rng):
    """The tool's functional forward == an nn.Module forward (full-size
    config shrunk to 12 blocks is too slow on CPU; check semantics on the
    first blocks with matching strides)."""
    torch.manual_seed(0)
    channels = (4, 8, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16)
    kernels = (25, 25, 15, 15, 10, 10, 10, 10, 5, 5, 5, 5)
    strides = (4, 4, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1)
    oracle = OracleFXencoder(channels, kernels, strides)
    oracle.eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    sd = {}
    for i, blk in enumerate(oracle.blocks):
        for cname, conv in (("conv1", blk.conv1), ("conv2", blk.conv2)):
            base = f"encoder.{i}.{cname}.conv1d"
            sd[f"{base}.conv1d.weight"] = conv.conv.weight.detach().numpy()
            sd[f"{base}.conv1d.bias"] = conv.conv.bias.detach().numpy()
            sd[f"{base}.batch_norm.weight"] = conv.bn.weight.detach().numpy()
            sd[f"{base}.batch_norm.bias"] = conv.bn.bias.detach().numpy()
            sd[f"{base}.batch_norm.running_mean"] = conv.bn.running_mean.numpy()
            sd[f"{base}.batch_norm.running_var"] = conv.bn.running_var.numpy()

    x = (rng.standard_normal((1, 2, 2**14)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    out = torch_fxencoder_forward(sd, x, n_blocks=12)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_parity_checker_on_synthetic_ckpt(tmp_path, rng):
    """End-to-end: save an oracle checkpoint in the reference format and run
    both checks; JAX vs torch must agree to cosine ~1 / NRMSE ~0."""
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.config import FXencoderConfig, TCNConfig
    from music_mixing_style_transfer_tpu.models import FXencoder, MixFXcloner
    from music_mixing_style_transfer_tpu.models.torch_import import (
        fxencoder_from_torch,
        mixfxcloner_from_torch,
        load_torch_state_dict,
    )

    torch.manual_seed(3)
    oracle = OracleTCN(nblocks=3, k=15, width=16, cond_dim=32, stack=15)
    oracle.eval()
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
    pt = str(tmp_path / "conv.pt")
    torch.save({"model": sd}, pt)

    sd_np = load_torch_state_dict(pt)
    x = (rng.standard_normal((1, 2, 4096)) * 0.1).astype(np.float32)
    cond = rng.standard_normal((1, 32)).astype(np.float32)
    ref = torch_mixfxcloner_forward(sd_np, x, cond, n_blocks=3)

    cfg = TCNConfig(condition_dimension=32, nblocks=3, channel_width=16, kernel_size=15)
    variables = mixfxcloner_from_torch(sd_np, n_blocks=3)
    ours = np.asarray(MixFXcloner(config=cfg).apply(variables, jnp.asarray(x), jnp.asarray(cond)))
    nrmse = np.sqrt(np.mean((ref - ours) ** 2)) / np.sqrt(np.mean(ref**2))
    assert nrmse < 1e-4

"""Independent PyTorch oracles for parity testing.

These are *test-only* minimal implementations of the documented reference
architecture semantics (conv stack layout, FiLM ordering, BN behaviour,
NT-Xent/spectral-loss math) used to validate the JAX models numerically.
They are written from the architectural spec in SURVEY.md §2.4 / §3.4-3.5.
"""
from __future__ import annotations

import torch
import torch.nn as nn


# ---------------------------------------------------------------- FXencoder
class OracleConvLayer(nn.Module):
    """reflect-pad(SAME, asymmetric) -> conv -> BN -> act."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, activation="relu"):
        super().__init__()
        pad = (k - 1) * dilation
        l = pad // 2
        self.pad = nn.ReflectionPad1d((l, pad - l))
        self.conv = nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation, bias=True)
        self.bn = nn.BatchNorm1d(cout)
        self.act = nn.ReLU() if activation == "relu" else nn.LeakyReLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(self.pad(x))))


class OracleResBlock(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv1 = OracleConvLayer(cin, cin, k)
        self.conv2 = OracleConvLayer(cin, cout, k, stride=stride)

    def forward(self, x):
        return self.conv2(self.conv1(x) + x)


class OracleFXencoder(nn.Module):
    def __init__(self, channels, kernels, strides):
        super().__init__()
        chans = [2] + list(channels)
        self.blocks = nn.ModuleList(
            [
                OracleResBlock(chans[i], chans[i + 1], kernels[i], strides[i])
                for i in range(len(kernels))
            ]
        )

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x.mean(-1)


# ---------------------------------------------------------------- TCN
class OracleFiLM(nn.Module):
    def __init__(self, cond_dim, features):
        super().__init__()
        self.fc = nn.Linear(cond_dim, 2 * features)
        self.features = features

    def forward(self, x, cond):
        f = self.fc(cond).unsqueeze(-1)
        r, b = torch.split(f, self.features, dim=1)
        return r * x + b


class OracleTCNBlock(nn.Module):
    def __init__(self, cin, cout, k, dilation, cond_dim):
        super().__init__()
        pad = ((k - 1) * dilation) // 2
        self.conv1 = nn.Conv1d(cin, cout, k, padding=pad, dilation=dilation, bias=False)
        self.bn = nn.BatchNorm1d(cout)
        self.relu = nn.LeakyReLU()
        self.film = OracleFiLM(cond_dim, cout)
        self.res = nn.Conv1d(cin, cout, 1, groups=cin, bias=False)

    def forward(self, x, cond):
        h = self.film(self.relu(self.bn(self.conv1(x))), cond)
        return h + self.res(x)


class OracleTCN(nn.Module):
    def __init__(self, nblocks=14, k=15, width=128, cond_dim=2048, stack=15):
        super().__init__()
        blocks = []
        cin = 2
        for n in range(nblocks):
            blocks.append(OracleTCNBlock(cin, width, k, 2 ** (n % stack), cond_dim))
            cin = width
        self.blocks = nn.ModuleList(blocks)
        self.output = nn.Conv1d(width, 2, 1)

    def forward(self, x, cond):
        for b in self.blocks:
            x = b(x, cond)
        return torch.clamp(self.output(x), -1, 1)


# ---------------------------------------------------------------- weight export
def fxencoder_state_to_jax(model: OracleFXencoder):
    """Export oracle weights to the flax variable pytree layout."""
    import numpy as np

    params, stats = {}, {}
    for i, blk in enumerate(model.blocks):
        pb, sb = {}, {}
        for name, layer in (("conv1", blk.conv1), ("conv2", blk.conv2)):
            pb[name] = {
                "weight": layer.conv.weight.detach().numpy(),
                "bias": layer.conv.bias.detach().numpy(),
                "bn": {
                    "scale": layer.bn.weight.detach().numpy(),
                    "bias": layer.bn.bias.detach().numpy(),
                },
            }
            sb[name] = {
                "bn": {
                    "mean": layer.bn.running_mean.detach().numpy(),
                    "var": layer.bn.running_var.detach().numpy(),
                }
            }
        params[f"block{i}"] = pb
        stats[f"block{i}"] = sb
    return {"params": params, "batch_stats": stats}


def tcn_state_to_jax(model: OracleTCN):
    params, stats = {}, {}
    for n, blk in enumerate(model.blocks):
        params[f"block{n}"] = {
            "conv1_weight": blk.conv1.weight.detach().numpy(),
            "res_weight": blk.res.weight.detach().numpy(),
            "bn": {
                "scale": blk.bn.weight.detach().numpy(),
                "bias": blk.bn.bias.detach().numpy(),
            },
            "film": {
                "weight": blk.film.fc.weight.detach().numpy(),
                "bias": blk.film.fc.bias.detach().numpy(),
            },
        }
        stats[f"block{n}"] = {
            "bn": {
                "mean": blk.bn.running_mean.detach().numpy(),
                "var": blk.bn.running_var.detach().numpy(),
            }
        }
    params["output_weight"] = model.output.weight.detach().numpy()
    params["output_bias"] = model.output.bias.detach().numpy()
    return {"params": params, "batch_stats": stats}

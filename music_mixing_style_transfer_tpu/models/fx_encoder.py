"""FXencoder: contrastive audio-effects encoder.

TPU-native re-design of the reference FXencoder
(``mixing_style_transfer/networks/architectures.py:26-70``): a stack of 12
residual 1-D conv blocks (channels 2->16->...->2048, total time downsample
x4096) followed by global average pooling to a 2048-D style embedding.
~81.4M parameters with the default config.

Input:  ``[batch, 2, T]`` stereo waveform.
Output: ``[batch, 2048]`` effects embedding.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import FXencoderConfig
from .blocks import ResConvBlock, Conv1dLayer


class FXencoder(nn.Module):
    config: FXencoderConfig = FXencoderConfig()
    train: bool = False
    # run the stack on [B, T, C] activations (one transpose at input; the
    # global average pool absorbs the output transpose); identical params
    channels_last: bool = True
    # rematerialize each block on the backward pass (jax.checkpoint): trades
    # ~1 extra forward of FLOPs for O(1-block) activation memory — the HBM
    # lever for long-segment / large-batch contrastive training. Parameters
    # and numerics are unchanged (nn.remat is transparent to the pytree).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        res_cls, conv_cls = ResConvBlock, Conv1dLayer
        if self.remat and self.train:
            res_cls, conv_cls = nn.remat(ResConvBlock), nn.remat(Conv1dLayer)
        if self.channels_last:
            x = jnp.swapaxes(x, -1, -2)
        channels = (cfg.in_channels,) + tuple(cfg.channels)
        for i, (k, s, d) in enumerate(zip(cfg.kernels, cfg.strides, cfg.dilation)):
            if cfg.conv_block == "res":
                x = res_cls(
                    in_channels=channels[i],
                    out_channels=channels[i + 1],
                    kernel_size=k,
                    stride=s,
                    padding="SAME",
                    dilation=d,
                    use_bias=cfg.bias,
                    norm=cfg.norm,
                    activation=cfg.activation,
                    last_activation=cfg.activation,
                    train=self.train,
                    channels_last=self.channels_last,
                    name=f"block{i}",
                )(x)
            else:
                x = conv_cls(
                    in_channels=channels[i],
                    out_channels=channels[i + 1],
                    kernel_size=k,
                    stride=s,
                    padding="VALID",
                    dilation=d,
                    use_bias=cfg.bias,
                    norm=cfg.norm,
                    activation=cfg.activation,
                    train=self.train,
                    channels_last=self.channels_last,
                    name=f"block{i}",
                )(x)
        # global average pool over time (AdaptiveAvgPool1d(1), architectures.py:62-70)
        return jnp.mean(x, axis=-2 if self.channels_last else -1)

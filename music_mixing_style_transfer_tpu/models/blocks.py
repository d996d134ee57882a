"""Building blocks for the mixing-style-transfer networks.

Semantics-compatible re-design of the reference conv stack
(``mixing_style_transfer/networks/network_utils.py:15-182``) as flax modules:

- ``Conv1dLayer``: reflect-pad (asymmetric SAME) -> conv -> batch-norm -> act.
- ``ResConvBlock``: conv1 (channel-preserving) + residual add, then strided
  conv2 (``network_utils.py:96-119``).
- ``FiLM``: feature-wise linear modulation (``network_utils.py:156-182``).

Layout notes (TPU-first):
- Activations are ``[batch, channels, time]`` ("NCH"); XLA lowers 1-D convs
  in this layout onto the MXU directly.
- Conv kernels are stored in the torch layout ``[out_ch, in_ch, k]`` so
  published PyTorch checkpoints map 1:1 onto the param pytree
  (see ``models/torch_import.py``).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-5  # torch.nn.BatchNorm1d default
BN_MOMENTUM = 0.9  # linen convention: new = m*old + (1-m)*batch  (torch momentum=0.1)
LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default

# Global conv precision. DEFAULT lets the MXU use fast bf16 passes (the right
# choice on TPU: ~6x faster convs; measured on-chip at production shapes
# (tools/tpu_checks.py, TPU_CHECKS.json): bf16-vs-f32 embedding cosine
# 0.999997 — 300x margin inside the 0.999 north-star — and converter
# waveform NRMSE 3.1e-3). HIGHEST forces full f32 accumulation (used by the
# CPU parity tests implicitly since CPU always computes f32).
_CONV_PRECISION = jax.lax.Precision.DEFAULT


def set_conv_precision(precision: str) -> None:
    """Set global conv precision: 'default' (fast bf16 MXU) or 'highest'."""
    global _CONV_PRECISION
    _CONV_PRECISION = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )


def get_conv_precision():
    return _CONV_PRECISION


def same_reflect_pad(x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """Asymmetric SAME reflect padding on the time axis.

    Matches reference ``network_utils.py:30-34,47``: total pad = (k-1)*d,
    left = pad//2, right = pad - left, mode=reflect.
    """
    pad = (kernel_size - 1) * dilation
    l = pad // 2
    r = pad - l
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (l, r)), mode="reflect")


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: str | Sequence[Tuple[int, int]] = "VALID",
) -> jnp.ndarray:
    """1-D convolution, NCH activations, torch-layout kernel [out, in/groups, k]."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NCH", "OIH", "NCH"))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else list(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=_CONV_PRECISION,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def conv1d_nhc(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dilation: int = 1,
    causal: bool = False,
) -> jnp.ndarray:
    """Same-length 1-D conv on channels-LAST ``[B, T, C]`` activations with
    the dilation folded into a second spatial axis.

    A dilation-``d`` conv equals a dense conv applied to the ``d`` interleaved
    subsequences ``x[..., r::d, :]``; viewing ``[B, T, C]`` as ``[B, T/d, d, C]``
    makes that a (k, 1) NHWC 2-D conv — the layout/algorithm XLA:TPU tiles
    best (measured ~140 TFLOP/s bf16 on v5e vs ~74 for the direct dilated
    NCH lowering at d >= 1024). Kernel stays in torch layout ``[O, I, K]``
    for checkpoint compatibility. Symmetric zero pad ``(k-1)*d/2`` per side
    (torch Conv1d ``padding=(k-1)*d//2``), or left-only ``(k-1)*d`` if causal.
    """
    K = kernel.shape[-1]
    wh = jnp.transpose(kernel, (2, 1, 0))  # [K, I, O]
    B, T, Cin = x.shape
    pl, pr = ((K - 1), 0) if causal else ((K - 1) // 2, (K - 1) - (K - 1) // 2)
    if dilation == 1:
        dn = jax.lax.conv_dimension_numbers(x.shape, wh.shape, ("NHC", "HIO", "NHC"))
        y = jax.lax.conv_general_dilated(
            x, wh, (1,), [(pl, pr)], dimension_numbers=dn, precision=_CONV_PRECISION
        )
    else:
        d = dilation
        Tp = -(-T // d) * d
        if Tp != T:
            # right zero-pad to a multiple of d; extra outputs are sliced off
            # and in-range outputs see zeros beyond T exactly like the
            # reference's zero padding
            x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        x4 = x.reshape(B, Tp // d, d, Cin)
        w4 = wh[:, None, :, :]  # [K, 1, I, O]
        dn = jax.lax.conv_dimension_numbers(x4.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x4, w4, (1, 1), [(pl, pr), (0, 0)], dimension_numbers=dn,
            precision=_CONV_PRECISION,
        )
        y = y.reshape(B, Tp, -1)[:, :T]
    if bias is not None:
        y = y + bias[None, None, :]
    return y


def _torch_conv_init(in_ch: int, kernel_size: int, groups: int = 1):
    """torch Conv1d default init: kaiming-uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in), fan_in = (in_ch/groups) * k."""
    fan_in = (in_ch // groups) * kernel_size

    def kernel_init(key, shape, dtype=jnp.float32):
        # kaiming_uniform(a=sqrt(5)): gain sqrt(1/3) * sqrt(3/fan_in)
        # collapses to exactly 1/sqrt(fan_in)
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    def bias_init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init, bias_init


class BatchNorm1d(nn.Module):
    """Batch norm over channel axis of NCH input, torch semantics.

    Eval: ``(x - running_mean)/sqrt(running_var + eps) * scale + bias``.
    Train: batch statistics over (N, T); running stats updated with torch
    momentum 0.1 and *unbiased* variance (torch parity).
    """

    features: int
    use_running_average: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], fold: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))

        if fold:
            # eval-mode BN is a per-channel affine y = x*s + t; return (s, t)
            # so callers can fold it into an adjacent conv / fused kernel
            assert self.use_running_average, "fold() is eval-only"
            s = scale * jax.lax.rsqrt(ra_var.value + BN_EPS)
            return s, bias - ra_mean.value * s

        reduce_axes = (0, 1) if self.channels_last else (0, 2)
        bcast = (None, None, slice(None)) if self.channels_last else (None, slice(None), None)

        if self.use_running_average:
            # eval: follow the caller's dtypes (bf16 inference stays bf16)
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + BN_EPS)
            y = (x - mean[bcast]) * inv[bcast]
            return y * scale[bcast] + bias[bcast]

        # train: statistics ALWAYS in f32 — in bf16 mixed precision the
        # E[x^2]-E[x]^2 form catastrophically cancels (var can round to
        # <= 0 -> NaN), and running stats must not quantize through bf16
        xs = x.astype(jnp.float32)
        mean = jnp.mean(xs, axis=reduce_axes)
        var = jnp.mean(jnp.square(xs), axis=reduce_axes) - jnp.square(mean)
        n = x.shape[reduce_axes[0]] * x.shape[reduce_axes[1]]
        unbiased = var * (n / max(n - 1, 1))
        if not self.is_initializing():
            ra32 = ra_mean.value.astype(jnp.float32)
            rv32 = ra_var.value.astype(jnp.float32)
            ra_mean.value = (
                BN_MOMENTUM * ra32 + (1 - BN_MOMENTUM) * mean
            ).astype(ra_mean.value.dtype)
            ra_var.value = (
                BN_MOMENTUM * rv32 + (1 - BN_MOMENTUM) * unbiased
            ).astype(ra_var.value.dtype)

        inv = jax.lax.rsqrt(var + BN_EPS)
        y = (xs - mean[bcast]) * inv[bcast]
        y = y * scale.astype(jnp.float32)[bcast] + bias.astype(jnp.float32)[bcast]
        return y.astype(x.dtype)


class Conv1dLayer(nn.Module):
    """conv -> norm -> activation with SAME (reflect) or VALID padding.

    Mirrors reference ``network_utils.py:15-89`` ("conv" mode only; the
    deconv / alias_free modes are unused by the shipped models).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: str = "SAME"  # "SAME" (reflect) or "VALID"
    dilation: int = 1
    use_bias: bool = True
    norm: str = "batch"
    activation: str = "relu"
    train: bool = False
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k_init, b_init = _torch_conv_init(self.in_channels, self.kernel_size)
        kernel = self.param(
            "weight", k_init, (self.out_channels, self.in_channels, self.kernel_size)
        )
        bias = self.param("bias", b_init, (self.out_channels,)) if self.use_bias else None

        if self.channels_last:
            # x: [B, T, C]
            if self.padding == "SAME":
                pad = (self.kernel_size - 1) * self.dilation
                l = pad // 2
                if pad:
                    x = jnp.pad(x, ((0, 0), (l, pad - l), (0, 0)), mode="reflect")
            wh = jnp.transpose(kernel, (2, 1, 0))  # [K, I, O]
            dn = jax.lax.conv_dimension_numbers(x.shape, wh.shape, ("NHC", "HIO", "NHC"))
            x = jax.lax.conv_general_dilated(
                x, wh, (self.stride,), [(0, 0)], rhs_dilation=(self.dilation,),
                dimension_numbers=dn, precision=_CONV_PRECISION,
            )
            if bias is not None:
                x = x + bias[None, None, :]
        else:
            if self.padding == "SAME":
                x = same_reflect_pad(x, self.kernel_size, self.dilation)
            x = conv1d(x, kernel, bias, stride=self.stride, dilation=self.dilation)

        if self.norm == "batch":
            x = BatchNorm1d(
                self.out_channels,
                use_running_average=not self.train,
                channels_last=self.channels_last,
                name="bn",
            )(x)

        if self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "lrelu":
            x = jax.nn.leaky_relu(x, LEAKY_SLOPE)
        return x


class ResConvBlock(nn.Module):
    """Residual block: ``conv2(conv1(x) + x)`` (reference ``network_utils.py:96-119``).

    conv1 preserves channels (the residual add happens after conv1's full
    conv->BN->act), conv2 changes channels and may stride.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: str = "SAME"
    dilation: int = 1
    use_bias: bool = True
    norm: str = "batch"
    activation: str = "relu"
    last_activation: str = "relu"
    train: bool = False
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = Conv1dLayer(
            self.in_channels,
            self.in_channels,
            self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            norm=self.norm,
            activation=self.activation,
            train=self.train,
            channels_last=self.channels_last,
            name="conv1",
        )(x)
        c1 = c1 + x
        return Conv1dLayer(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            norm=self.norm,
            activation=self.last_activation,
            train=self.train,
            channels_last=self.channels_last,
            name="conv2",
        )(c1)


class FiLM(nn.Module):
    """Feature-wise linear modulation (reference ``network_utils.py:156-182``).

    ``cond [B, cond_dim] -> linear -> (r, b)`` each ``[B, features]``;
    output ``r * x + b`` broadcast over time.
    """

    cond_dim: int
    features: int
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], cond: jnp.ndarray, rb: bool = False):
        def w_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / math.sqrt(self.cond_dim)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        # torch Linear layout: weight [out, in]
        weight = self.param("weight", w_init, (2 * self.features, self.cond_dim))
        bias = self.param("bias", w_init, (2 * self.features,))
        film = (
            jnp.dot(cond, weight.T, precision=jax.lax.Precision.HIGHEST) + bias
        )  # [B, 2*features]
        r, b = jnp.split(film, 2, axis=-1)
        if rb:
            return r, b  # for fused kernels that apply FiLM in-epilogue
        if self.channels_last:
            return r[:, None, :] * x + b[:, None, :]
        return r[:, :, None] * x + b[:, :, None]

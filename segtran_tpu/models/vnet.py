"""V-Net 3D baseline (selectable via --net vnet).

Parity target: reference code/networks/vnet.py: ConvBlock stacks (conv3x3x3 +
norm + ReLU), stride-2 down/deconv-up blocks, additive skips, 16-base
channels. Channels-last [B, H, W, D, C]. Param scopes mirror the torch
Sequential indices so checkpoints convert.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


def _norm(kind, g, train, dtype, name, axis_name=None):
    if kind == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype, axis_name=axis_name,
                            name=name)
    if kind == "groupnorm":
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=dtype,
                            name=name)
    if kind == "instancenorm":
        return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                            use_bias=False, use_scale=False, dtype=dtype,
                            name=name)
    return None


class ConvBlock(nn.Module):
    n_stages: int
    n_filters: int
    normalization: str = "none"
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        per = 3 if self.normalization != "none" else 2
        for i in range(self.n_stages):
            x = nn.Conv(self.n_filters, (3, 3, 3),
                        padding=((1, 1),) * 3, dtype=self.dtype,
                        name=f"conv_{per*i}")(x)
            norm = _norm(self.normalization, 16, train, self.dtype,
                         f"conv_{per*i+1}")
            if norm is not None:
                x = norm(x)
            last = (i == self.n_stages - 1)
            if not (self.residual and last):
                x = nn.relu(x)
        if self.residual:
            x = nn.relu(x + inputs)
        return x


class DownBlock(nn.Module):
    n_filters: int
    stride: int = 2
    normalization: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        x = nn.Conv(self.n_filters, (s, s, s), strides=(s, s, s),
                    dtype=self.dtype, name="conv_0")(x)
        norm = _norm(self.normalization, 16, train, self.dtype, "conv_1")
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class UpBlock(nn.Module):
    n_filters: int
    stride: int = 2
    normalization: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        x = nn.ConvTranspose(self.n_filters, (s, s, s), strides=(s, s, s),
                             dtype=self.dtype, name="conv_0")(x)
        norm = _norm(self.normalization, 16, train, self.dtype, "conv_1")
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class VNet(nn.Module):
    n_channels: int = 3
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf, nm, dt = self.n_filters, self.normalization, self.dtype
        kw = dict(normalization=nm, dtype=dt)
        x1 = ConvBlock(1, nf, name="block_one", **kw)(x, train)
        d1 = DownBlock(2 * nf, name="block_one_dw", **kw)(x1, train)
        x2 = ConvBlock(2, 2 * nf, name="block_two", **kw)(d1, train)
        d2 = DownBlock(4 * nf, name="block_two_dw", **kw)(x2, train)
        x3 = ConvBlock(3, 4 * nf, name="block_three", **kw)(d2, train)
        d3 = DownBlock(8 * nf, name="block_three_dw", **kw)(x3, train)
        x4 = ConvBlock(3, 8 * nf, name="block_four", **kw)(d3, train)
        d4 = DownBlock(16 * nf, name="block_four_dw", **kw)(x4, train)
        x5 = ConvBlock(3, 16 * nf, name="block_five", **kw)(d4, train)
        if self.has_dropout:
            # torch Dropout3d: whole-channel dropout
            x5 = nn.Dropout(0.5, broadcast_dims=(1, 2, 3))(
                x5, deterministic=not train)
        u5 = UpBlock(8 * nf, name="block_five_up", **kw)(x5, train) + x4
        x6 = ConvBlock(3, 8 * nf, name="block_six", **kw)(u5, train)
        u6 = UpBlock(4 * nf, name="block_six_up", **kw)(x6, train) + x3
        x7 = ConvBlock(3, 4 * nf, name="block_seven", **kw)(u6, train)
        u7 = UpBlock(2 * nf, name="block_seven_up", **kw)(x7, train) + x2
        x8 = ConvBlock(2, 2 * nf, name="block_eight", **kw)(u7, train)
        u8 = UpBlock(nf, name="block_eight_up", **kw)(x8, train) + x1
        x9 = ConvBlock(1, nf, name="block_nine", **kw)(u8, train)
        if self.has_dropout:
            x9 = nn.Dropout(0.5, broadcast_dims=(1, 2, 3))(
                x9, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1, 1), dtype=dt,
                       name="out_conv")(x9).astype(jnp.float32)

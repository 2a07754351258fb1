"""Attention U-Net family baselines (--net attunet / r2attunet and the plain
U_Net / R2U_Net variants).

Parity target: reference code/networks/att_unet.py -- conv_block (conv3x3 +
BN + ReLU x2), up_conv (nearest 2x upsample + conv + BN + ReLU),
Recurrent_block (t iterations of a SHARED conv applied to x + x1, :60-78),
RRCNN_block (1x1 conv + 2 recurrent blocks + residual), Attention_block
(additive attention gate with sigmoid psi). Channels-last NHWC.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import max_pool_nhwc


def _bn(train, dtype, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _upsample_nearest2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class ConvBlock(nn.Module):
    ch_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.ch_out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_0")(x)
        x = nn.relu(_bn(train, self.dtype, "conv_1")(x))
        x = nn.Conv(self.ch_out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_3")(x)
        return nn.relu(_bn(train, self.dtype, "conv_4")(x))


class UpConv(nn.Module):
    ch_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _upsample_nearest2x(x)
        x = nn.Conv(self.ch_out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="up_1")(x)
        return nn.relu(_bn(train, self.dtype, "up_2")(x))


class RecurrentBlock(nn.Module):
    """t iterations of one shared conv applied to (x + x1)
    (reference :60-78)."""
    ch_out: int
    t: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        conv = nn.Conv(self.ch_out, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_0")
        bn = _bn(train, self.dtype, "conv_1")
        x1 = None
        for i in range(self.t):
            if i == 0:
                x1 = nn.relu(bn(conv(x)))
            x1 = nn.relu(bn(conv(x + x1)))
        return x1


class RRCNNBlock(nn.Module):
    ch_out: int
    t: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.ch_out, (1, 1), dtype=self.dtype,
                    name="Conv_1x1")(x)
        x1 = RecurrentBlock(self.ch_out, self.t, self.dtype,
                            name="RCNN_0")(x, train)
        x1 = RecurrentBlock(self.ch_out, self.t, self.dtype,
                            name="RCNN_1")(x1, train)
        return x + x1


class AttentionBlock(nn.Module):
    f_int: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g, x, train=False):
        g1 = nn.Conv(self.f_int, (1, 1), dtype=self.dtype, name="W_g_0")(g)
        g1 = _bn(train, self.dtype, "W_g_1")(g1)
        x1 = nn.Conv(self.f_int, (1, 1), dtype=self.dtype, name="W_x_0")(x)
        x1 = _bn(train, self.dtype, "W_x_1")(x1)
        psi = nn.relu(g1 + x1)
        psi = nn.Conv(1, (1, 1), dtype=self.dtype, name="psi_0")(psi)
        psi = _bn(train, self.dtype, "psi_1")(psi)
        return x * nn.sigmoid(psi)


class AttUNet(nn.Module):
    """reference AttU_Net (:276-347). Set use_attention=False for U_Net,
    recurrent=True for R2(Att)U_Net."""
    num_classes: int = 1
    use_attention: bool = True
    recurrent: bool = False
    t: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if self.recurrent:
            enc = lambda ch, name: RRCNNBlock(ch, self.t, dt, name=name)
            dec = lambda ch, name: RRCNNBlock(ch, self.t, dt, name=name)
        else:
            enc = lambda ch, name: ConvBlock(ch, dt, name=name)
            dec = lambda ch, name: ConvBlock(ch, dt, name=name)
        x1 = enc(64, "Conv1")(x, train)
        x2 = enc(128, "Conv2")(max_pool_nhwc(x1, (2, 2)), train)
        x3 = enc(256, "Conv3")(max_pool_nhwc(x2, (2, 2)), train)
        x4 = enc(512, "Conv4")(max_pool_nhwc(x3, (2, 2)), train)
        x5 = enc(1024, "Conv5")(max_pool_nhwc(x4, (2, 2)), train)

        d5 = UpConv(512, dt, name="Up5")(x5, train)
        if self.use_attention:
            x4 = AttentionBlock(256, dt, name="Att5")(d5, x4, train)
        d5 = dec(512, "Up_conv5")(jnp.concatenate([x4, d5], -1), train)

        d4 = UpConv(256, dt, name="Up4")(d5, train)
        if self.use_attention:
            x3 = AttentionBlock(128, dt, name="Att4")(d4, x3, train)
        d4 = dec(256, "Up_conv4")(jnp.concatenate([x3, d4], -1), train)

        d3 = UpConv(128, dt, name="Up3")(d4, train)
        if self.use_attention:
            x2 = AttentionBlock(64, dt, name="Att3")(d3, x2, train)
        d3 = dec(128, "Up_conv3")(jnp.concatenate([x2, d3], -1), train)

        d2 = UpConv(64, dt, name="Up2")(d3, train)
        if self.use_attention:
            x1 = AttentionBlock(32, dt, name="Att2")(d2, x1, train)
        d2 = dec(64, "Up_conv2")(jnp.concatenate([x1, d2], -1), train)

        return nn.Conv(self.num_classes, (1, 1), dtype=dt,
                       name="Conv_1x1")(d2).astype(jnp.float32)

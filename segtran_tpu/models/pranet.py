"""PraNet baseline (--net pranet): receptive-field blocks + partial decoder +
reverse attention, returning 4 lateral maps.

Capability parity with the reference's vendored PraNet (reference
code/networks/pranet/PraNet_Res2Net.py): RFB_modified (:22-59), dense
aggregation partial decoder (:61-95), three reverse-attention branches
(:127-176), and the 4-tuple output whose lateral_map_2 drives the single-loss
training path (reference train2d.py:1207-1214), on the Res2Net-50-v1b
backbone the reference uses (PraNet_Res2Net.py:103), so reference PraNet
checkpoints convert.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.backbones.res2net import Res2NetFeatures
from ..ops.resize import resize_linear, resize_linear_align_corners


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        kh, kw = self.kernel
        d = self.dilation
        pad = ((d * (kh // 2),) * 2, (d * (kw // 2),) * 2)
        x = nn.Conv(self.features, (kh, kw), padding=pad,
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class RFBModified(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        f, dt = self.features, self.dtype
        b0 = BasicConv2d(f, (1, 1), dtype=dt, name="branch0_0")(x, train)
        branches = [b0]
        for bi, (k, d) in enumerate(((3, 3), (5, 5), (7, 7)), start=1):
            v = BasicConv2d(f, (1, 1), dtype=dt,
                            name=f"branch{bi}_0")(x, train)
            v = BasicConv2d(f, (1, k), dtype=dt,
                            name=f"branch{bi}_1")(v, train)
            v = BasicConv2d(f, (k, 1), dtype=dt,
                            name=f"branch{bi}_2")(v, train)
            v = BasicConv2d(f, (3, 3), dilation=d, dtype=dt,
                            name=f"branch{bi}_3")(v, train)
            branches.append(v)
        cat = BasicConv2d(f, (3, 3), dtype=dt, name="conv_cat")(
            jnp.concatenate(branches, -1), train)
        res = BasicConv2d(f, (1, 1), dtype=dt, name="conv_res")(x, train)
        return nn.relu(cat + res)


class Aggregation(nn.Module):
    channel: int
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train=False):
        dt = self.dtype
        up = lambda v: resize_linear_align_corners(
            v, (v.shape[1] * 2, v.shape[2] * 2))
        c = lambda f, name: BasicConv2d(f, (3, 3), dtype=dt, name=name)
        x1_1 = x1
        x2_1 = c(self.channel, "conv_upsample1")(up(x1), train) * x2
        x3_1 = (c(self.channel, "conv_upsample2")(up(up(x1)), train)
                * c(self.channel, "conv_upsample3")(up(x2), train) * x3)
        x2_2 = jnp.concatenate(
            [x2_1, c(self.channel, "conv_upsample4")(up(x1_1), train)], -1)
        x2_2 = c(2 * self.channel, "conv_concat2")(x2_2, train)
        x3_2 = jnp.concatenate(
            [x3_1, c(2 * self.channel, "conv_upsample5")(up(x2_2), train)],
            -1)
        x3_2 = c(3 * self.channel, "conv_concat3")(x3_2, train)
        v = c(3 * self.channel, "conv4")(x3_2, train)
        # the reference's aggregation ignores its out_channels arg and
        # hardcodes conv5 to ONE channel (PraNet_Res2Net.py:78); the
        # 1-channel global map then broadcasts into the num_classes-channel
        # reverse-attention branches. Quirk reproduced, num_classes kept for
        # the constructor-signature parity.
        return nn.Conv(1, (1, 1), dtype=dt, name="conv5")(v)


class PraNet(nn.Module):
    # the reference constructs PraNet(num_classes=args.num_classes - 1)
    # (train2d.py:946-947); lateral maps carry num_classes channels and the
    # background channel is prepended by the trainer
    num_classes: int = 1
    channel: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        feats = Res2NetFeatures(variant="res2net50", do_pool1=True, dtype=dt,
                                name="resnet")(x, train=train)
        _, x1, x2, x3, x4 = feats
        x2_rfb = RFBModified(self.channel, dt, name="rfb2_1")(x2, train)
        x3_rfb = RFBModified(self.channel, dt, name="rfb3_1")(x3, train)
        x4_rfb = RFBModified(self.channel, dt, name="rfb4_1")(x4, train)
        ra5 = Aggregation(self.channel, self.num_classes, dt,
                          name="agg1")(
            x4_rfb, x3_rfb, x2_rfb, train)
        lateral_5 = resize_linear(ra5.astype(jnp.float32), (h, w))

        def ra_branch(feat, crop, convs, scope):
            att = 1.0 - jax.nn.sigmoid(crop)
            r = feat.shape[-1] // att.shape[-1]
            v = jnp.tile(att, (1, 1, 1, r)) * feat
            for i, (f, k, act) in enumerate(convs):
                v = BasicConv2d(f, (k, k), dtype=dt,
                                name=f"{scope}_conv{i+1}")(v, train)
                if act:
                    v = nn.relu(v)
            return v + crop

        # branch 4 (1/32)
        crop4 = resize_linear(ra5, x4.shape[1:3])
        out4 = ra_branch(x4, crop4, [(256, 1, False), (256, 5, True),
                                     (256, 5, True), (256, 5, True),
                                     (self.num_classes, 1, False)], "ra4")
        lateral_4 = resize_linear(out4.astype(jnp.float32), (h, w))
        # branch 3 (1/16)
        crop3 = resize_linear(out4, x3.shape[1:3])
        out3 = ra_branch(x3, crop3, [(64, 1, False), (64, 3, True),
                                     (64, 3, True),
                                     (self.num_classes, 3, False)], "ra3")
        lateral_3 = resize_linear(out3.astype(jnp.float32), (h, w))
        # branch 2 (1/8)
        crop2 = resize_linear(out3, x2.shape[1:3])
        out2 = ra_branch(x2, crop2, [(64, 1, False), (64, 3, True),
                                     (64, 3, True),
                                     (self.num_classes, 3, False)], "ra2")
        lateral_2 = resize_linear(out2.astype(jnp.float32), (h, w))
        return lateral_5, lateral_4, lateral_3, lateral_2

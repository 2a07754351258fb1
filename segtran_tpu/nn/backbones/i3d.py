"""Inception-v1 I3D backbone in flax (channels-last, [B, T, H, W, C]).

Parity target: the reference's vendored AJ I3D (reference
code/networks/aj_i3d/aj_i3d.py): Unit3D = Conv3d + BN(eps 1e-3, momentum
0.01 torch == 0.99 flax) + ReLU with dynamic TF-SAME padding (aj_i3d.py:68-97
-- exactly flax padding='SAME'), MaxPool3dSamePadding (:6-30), Inception
modules (:101-127), and the endpoint taps Segtran3d uses
(segtran3d.py:427-432): MaxPool3d_2a_3x3, Conv3d_2c_3x3, Mixed_3c, Mixed_4f,
Mixed_5c. ``do_pool1=False`` (bb_feat_upsize) replaces the 2a max-pool with
identity (aj_i3d.py:206-211).

Module names mirror torch attribute names for weight conversion
('Conv3d_1a_7x7' -> {conv3d, bn}, 'Mixed_3b' -> {b0, b1a, b1b, b2a, b2b, b3b}).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import max_pool_nhwc


class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    with_relu: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             axis_name=self.bn_axis_name, name="bn")(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


def _maxpool_same(x, kernel, stride):
    """MaxPool3dSamePadding (aj_i3d.py:6-30): TF-SAME pads computed from the
    runtime size == reduce_window with SAME padding."""
    return max_pool_nhwc(x, kernel, strides=stride, padding="SAME")


class InceptionModule(nn.Module):
    out_channels: Tuple[int, ...]  # (b0, b1a, b1b, b2a, b2b, b3b)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0", **kw)(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a", **kw)(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b", **kw)(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a", **kw)(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b", **kw)(b2, train)
        b3 = _maxpool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b", **kw)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3DFeatures(nn.Module):
    """Endpoints pyramid for Segtran3d. Input [B, T, H, W, C=3]; returns the
    5 taps (MaxPool3d_2a_3x3, Conv3d_2c_3x3, Mixed_3c, Mixed_4f, Mixed_5c) with
    dims (64, 192, 480, 832, 1024)."""
    do_pool1: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7",
                   **kw)(x, train)
        if self.do_pool1:
            x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        tap_2a = x
        x = Unit3D(64, (1, 1, 1), name="Conv3d_2b_1x1", **kw)(x, train)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3", **kw)(x, train)
        tap_2c = x
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule((64, 96, 128, 16, 32, 32), name="Mixed_3b",
                            **kw)(x, train)
        x = InceptionModule((128, 128, 192, 32, 96, 64), name="Mixed_3c",
                            **kw)(x, train)
        tap_3c = x
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule((192, 96, 208, 16, 48, 64), name="Mixed_4b",
                            **kw)(x, train)
        x = InceptionModule((160, 112, 224, 24, 64, 64), name="Mixed_4c",
                            **kw)(x, train)
        x = InceptionModule((128, 128, 256, 24, 64, 64), name="Mixed_4d",
                            **kw)(x, train)
        x = InceptionModule((112, 144, 288, 32, 64, 64), name="Mixed_4e",
                            **kw)(x, train)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_4f",
                            **kw)(x, train)
        tap_4f = x
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_5b",
                            **kw)(x, train)
        x = InceptionModule((384, 192, 384, 48, 128, 128), name="Mixed_5c",
                            **kw)(x, train)
        tap_5c = x
        return (tap_2a, tap_2c, tap_3c, tap_4f, tap_5c)

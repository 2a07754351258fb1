"""Res2Net-v1b feature extractor in flax (channels-last) -- the PraNet
backbone (reference code/networks/pranet/Res2Net_v1b.py).

v1b specifics vs plain ResNet (reference :100-117, :127-136):
  * deep 3-conv stem (3x3 s2 -> 32, 3x3 -> 32, 3x3 -> 64) instead of one 7x7,
  * avg-pool + 1x1-conv shortcut downsample (AvgPool2d(stride, ceil_mode=True,
    count_include_pad=False) then stride-1 conv),
  * Bottle2neck (:16-93): the 1x1-compressed features split into ``scale``
    chunks of ``width = floor(planes * baseWidth/64)``; chunks pass through a
    chain of 3x3 convs with hierarchical residual adds ('normal' blocks) or
    independently ('stage' blocks); the last chunk is passed through (normal)
    or 3x3-avg-pooled (stage, count_include_pad=True -- torch default).

Flax scope names mirror the torch attribute paths (ModuleList index `a.b.0`
<-> flax scope `b_0`; the stem Sequential conv1.0/.1/.3/.4/.6 <-> conv1_0...)
so convert/torch_import.py maps reference PraNet checkpoints generically.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import max_pool_nhwc

RES2NET_LAYERS = {
    "res2net50": (3, 4, 6, 3),
    "res2net101": (3, 4, 23, 3),
}


def _bn(train, axis_name, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, axis_name=axis_name,
                        name=name)


def _conv(feats, k, stride, name, dtype, pad=None):
    if pad is None:
        pad = k // 2
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   dtype=dtype, name=name)


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0,
               count_include_pad: bool = True) -> jnp.ndarray:
    """torch nn.AvgPool2d on NHWC. ceil_mode is floor here: the v1b shortcut
    pool has kernel == stride, where ceil and floor agree for the even
    spatial dims every segtran/PraNet input uses."""
    dims = (1, kernel, kernel, 1)
    strd = (1, stride, stride, 1)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strd, pad)
    if count_include_pad:
        return summed / float(kernel * kernel)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strd, pad)
    return summed / cnt


class Bottle2neck(nn.Module):
    """reference Res2Net_v1b.py:16-93. expansion = 4."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    stype: str = "normal"       # 'stage' for the first block of a stage
    base_width: int = 26
    scale: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        nums = 1 if self.scale == 1 else self.scale - 1
        residual = x
        out = _conv(width * self.scale, 1, 1, "conv1", self.dtype, pad=0)(x)
        out = nn.relu(_bn(train, self.bn_axis_name, self.dtype, "bn1")(out))

        spx = [out[..., i * width:(i + 1) * width]
               for i in range(self.scale)]
        pieces = []
        sp = None
        for i in range(nums):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = _conv(width, 3, self.stride, f"convs_{i}", self.dtype)(sp)
            sp = nn.relu(_bn(train, self.bn_axis_name, self.dtype,
                             f"bns_{i}")(sp))
            pieces.append(sp)
        if self.scale != 1:
            last = spx[nums]
            if self.stype == "stage":
                # reference :42: AvgPool2d(3, stride, padding=1) -- torch
                # default count_include_pad=True
                last = avg_pool2d(last, 3, self.stride, padding=1,
                                  count_include_pad=True)
            pieces.append(last)
        out = jnp.concatenate(pieces, -1)

        out = _conv(self.planes * 4, 1, 1, "conv3", self.dtype, pad=0)(out)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn3")(out)
        if self.has_downsample:
            # reference :130-136: AvgPool(stride) -> 1x1 conv s1 -> BN;
            # Sequential index 0 is the pool, so conv/bn are _1/_2
            residual = avg_pool2d(x, self.stride, self.stride,
                                  count_include_pad=False)
            residual = _conv(self.planes * 4, 1, 1, "downsample_1",
                             self.dtype, pad=0)(residual)
            residual = _bn(train, self.bn_axis_name, self.dtype,
                           "downsample_2")(residual)
        return nn.relu(out + residual)


class Res2NetFeatures(nn.Module):
    """5-level pyramid (stem[+pool], layer1..layer4), matching
    ResNetFeatures' contract so PraNet can swap backbones. do_pool1=False is
    the bb_feat_upsize 2x-resolution mode (stem max-pool dropped)."""
    variant: str = "res2net50"
    do_pool1: bool = True
    base_width: int = 26
    scale: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        layers = RES2NET_LAYERS[self.variant]
        # deep stem (reference :102-110): Sequential(conv,bn,relu)x2 + conv
        x = _conv(32, 3, 2, "conv1_0", self.dtype)(x)
        x = nn.relu(_bn(train, self.bn_axis_name, self.dtype, "conv1_1")(x))
        x = _conv(32, 3, 1, "conv1_3", self.dtype)(x)
        x = nn.relu(_bn(train, self.bn_axis_name, self.dtype, "conv1_4")(x))
        x = _conv(64, 3, 1, "conv1_6", self.dtype)(x)
        x = nn.relu(_bn(train, self.bn_axis_name, self.dtype, "bn1")(x))
        if self.do_pool1:
            x = max_pool_nhwc(x, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
        feats = [x]
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                first = bi == 0
                need_ds = first and (s != 1 or inplanes != planes * 4)
                x = Bottle2neck(planes, s, need_ds,
                                "stage" if first else "normal",
                                self.base_width, self.scale,
                                self.bn_axis_name, self.dtype,
                                name=f"layer{li+1}_{bi}")(x, train=train)
                inplanes = planes * 4
            feats.append(x)
        return tuple(feats)

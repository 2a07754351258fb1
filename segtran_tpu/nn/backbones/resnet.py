"""ResNet-34/50/101 feature extractor in flax (channels-last).

Mirrors the reference's custom torchvision-style ResNet (reference
code/resnet.py): BasicBlock / Bottleneck (stride on the 3x3 conv),
``ext_features`` returning the 5-level pyramid (resnet.py:186-201), and the
``do_pool1`` flag that drops the stem max-pool to double all feature maps
(bb_feat_upsize). Param names align with torch attribute names for conversion.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import max_pool_nhwc

RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _bn(train, axis_name, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, axis_name=axis_name,
                        name=name)


def _conv(feats, k, stride, name, dtype, pad=None, dilation=1):
    if pad is None:
        pad = dilation * (k // 2)
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation), use_bias=False,
                   dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None
    dilation: int = 1      # 3x3 conv dilation (torchvision
    #                        replace_stride_with_dilation support)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype,
                    dilation=self.dilation)(x)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype,
                    dilation=self.dilation)(out)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn2")(out)
        if self.has_downsample:
            residual = _conv(self.planes, 1, self.stride, "downsample_0",
                             self.dtype, pad=0)(x)
            residual = _bn(train, self.bn_axis_name, self.dtype,
                           "downsample_1")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None
    dilation: int = 1      # 3x3 conv dilation (torchvision
    #                        replace_stride_with_dilation support)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype, pad=0)(x)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype,
                    dilation=self.dilation)(out)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, "conv3", self.dtype, pad=0)(out)
        out = _bn(train, self.bn_axis_name, self.dtype, "bn3")(out)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, "downsample_0",
                             self.dtype, pad=0)(x)
            residual = _bn(train, self.bn_axis_name, self.dtype,
                           "downsample_1")(residual)
        return nn.relu(out + residual)


class ResNetFeatures(nn.Module):
    """5-level pyramid: (stem[+pool], layer1..layer4) -- reference
    resnet.py:186-201 ext_features."""
    variant: str = "resnet50"
    do_pool1: bool = True     # False == bb_feat_upsize (2x feature maps)
    # SMP ResNetEncoder taps (smp encoders/resnet.py:47-55): the first
    # feature is the PRE-maxpool stem (stride 2) instead of ext_features'
    # post-pool x0_pool; layer1 still consumes the pooled stem
    stem_prepool_tap: bool = False
    bn_axis_name: Optional[str] = None
    # torchvision replace_stride_with_dilation for layers 2..4 (deeplab
    # output-stride tricks): when set for a layer, its stride moves into
    # dilation; the layer's FIRST block keeps the previous dilation
    # (torchvision _make_layer, deeplab/backbone/resnet.py:173-181)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False,
                                                             False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        block_type, layers = RESNET_LAYERS[self.variant]
        block_cls = BasicBlock if block_type == "basic" else Bottleneck
        expansion = 1 if block_type == "basic" else 4

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.bn_axis_name, self.dtype, "bn1")(x)
        x = nn.relu(x)
        stem = x
        if self.do_pool1:
            x = max_pool_nhwc(x, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
        x0 = stem if self.stem_prepool_tap else x

        feats = [x0]
        inplanes = 64
        dilation = 1
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            prev_dilation = dilation
            if li > 0 and self.replace_stride_with_dilation[li - 1]:
                dilation *= stride
                stride = 1
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                d = prev_dilation if bi == 0 else dilation
                need_ds = (bi == 0) and (s != 1 or inplanes != planes * expansion)
                x = block_cls(planes, s, need_ds, self.bn_axis_name, d,
                              self.dtype,
                              name=f"layer{li+1}_{bi}")(x, train=train)
                inplanes = planes * expansion
            feats.append(x)
        return tuple(feats)

"""EfficientNetV2-S/M/L feature extractor in flax.

Capability parity with the reference's timm `tf_efficientnetv2_*_in21k
(features_only=True)` backbones (reference segtran2d.py:106-117, feature dims
[24, 48, 80, 176, 512] for v2-m with a stem-stride override). Architecture
from the EfficientNetV2 paper: Fused-MBConv in the early stages, MBConv+SE in
the later stages; feature taps at each resolution change (the timm
features_only convention), giving a 5-level pyramid at strides
(stem, 2, 4, 8, 16)/stem_stride.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (block, repeats, kernel, stride, expand, out_ch, se_ratio)
_V2_CONFIGS = {
    "effv2s": (
        ("fused", 2, 3, 1, 1, 24, 0.0),
        ("fused", 4, 3, 2, 4, 48, 0.0),
        ("fused", 4, 3, 2, 4, 64, 0.0),
        ("mb", 6, 3, 2, 4, 128, 0.25),
        ("mb", 9, 3, 1, 6, 160, 0.25),
        ("mb", 15, 3, 2, 6, 256, 0.25),
    ),
    "effv2m": (
        ("fused", 3, 3, 1, 1, 24, 0.0),
        ("fused", 5, 3, 2, 4, 48, 0.0),
        ("fused", 5, 3, 2, 4, 80, 0.0),
        ("mb", 7, 3, 2, 4, 160, 0.25),
        ("mb", 14, 3, 1, 6, 176, 0.25),
        ("mb", 18, 3, 2, 6, 304, 0.25),
        ("mb", 5, 3, 1, 6, 512, 0.25),
    ),
    "effv2l": (
        ("fused", 4, 3, 1, 1, 32, 0.0),
        ("fused", 7, 3, 2, 4, 64, 0.0),
        ("fused", 7, 3, 2, 4, 96, 0.0),
        ("mb", 10, 3, 2, 4, 192, 0.25),
        ("mb", 19, 3, 1, 6, 224, 0.25),
        ("mb", 25, 3, 2, 6, 384, 0.25),
        ("mb", 7, 3, 1, 6, 640, 0.25),
    ),
}
_V2_STEM = {"effv2s": 24, "effv2m": 24, "effv2l": 32}


def _bn(train, axis_name, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=dtype, axis_name=axis_name,
                        name=name)


class _V2Block(nn.Module):
    kind: str          # fused | mb
    out_ch: int
    in_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inputs = x
        exp = self.in_ch * self.expand
        k = self.kernel
        if self.kind == "fused":
            if self.expand != 1:
                x = nn.Conv(exp, (k, k), strides=(self.stride,) * 2,
                            padding="SAME", use_bias=False, dtype=self.dtype,
                            name="conv_exp")(x)
                x = nn.silu(_bn(train, self.bn_axis_name, self.dtype,
                                "bn1")(x))
                x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv_pwl")(x)
                x = _bn(train, self.bn_axis_name, self.dtype, "bn2")(x)
            else:
                x = nn.Conv(self.out_ch, (k, k), strides=(self.stride,) * 2,
                            padding="SAME", use_bias=False, dtype=self.dtype,
                            name="conv")(x)
                x = nn.silu(_bn(train, self.bn_axis_name, self.dtype,
                                "bn1")(x))
        else:
            x = nn.Conv(exp, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_pw")(x)
            x = nn.silu(_bn(train, self.bn_axis_name, self.dtype, "bn1")(x))
            x = nn.Conv(exp, (k, k), strides=(self.stride,) * 2,
                        padding="SAME", feature_group_count=exp,
                        use_bias=False, dtype=self.dtype, name="conv_dw")(x)
            x = nn.silu(_bn(train, self.bn_axis_name, self.dtype, "bn2")(x))
            if self.se_ratio > 0:
                nsq = max(1, int(self.in_ch * self.se_ratio))
                se = jnp.mean(x, axis=(1, 2), keepdims=True)
                se = nn.silu(nn.Conv(nsq, (1, 1), dtype=self.dtype,
                                     name="se_reduce")(se))
                se = nn.Conv(exp, (1, 1), dtype=self.dtype,
                             name="se_expand")(se)
                x = jax.nn.sigmoid(se) * x
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_pwl")(x)
            x = _bn(train, self.bn_axis_name, self.dtype, "bn3")(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inputs
        return x


class EfficientNetV2Features(nn.Module):
    variant: str = "effv2m"
    stem_stride: int = 2
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        cfgs = _V2_CONFIGS[self.variant]
        x = nn.Conv(_V2_STEM[self.variant], (3, 3),
                    strides=(self.stem_stride,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = nn.silu(_bn(train, self.bn_axis_name, self.dtype, "bn_stem")(x))
        taps = []
        in_ch = _V2_STEM[self.variant]
        prev = x
        for si, (kind, r, k, s, e, oc, se) in enumerate(cfgs):
            for j in range(r):
                stride = s if j == 0 else 1
                if j == 0 and stride > 1:
                    taps.append(prev)   # last activation before downsampling
                x = _V2Block(kind, oc, in_ch if j == 0 else oc, k, stride, e,
                             se, self.bn_axis_name, self.dtype,
                             name=f"s{si}_b{j}")(x, train)
                prev = x
                in_ch = oc
        taps.append(x)
        # keep exactly 5 levels (timm features_only convention)
        if len(taps) > 5:
            taps = taps[:4] + [taps[-1]]
        return tuple(taps)

"""Deformable U-Net baseline (--net dunet).

Parity target: reference code/networks/deformable_unet/deform_unet.py
DUNetV1V2: U-Net with 1/4-width filters where down1/down2 use deformable
double-convs and up3/up4 use deformable double-convs; the input is
concatenated before the 1x1 output conv. Deformable conv is a JAX
gather-based implementation (ops/deform_conv.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.deform_conv import DeformConv2d
from ..ops.resize import max_pool_nhwc, resize_linear_align_corners


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class DoubleConv(nn.Module):
    out_ch: int
    deform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            if self.deform:
                # reference wires padding=0 (deform_part.py:12,16): spatial
                # size is preserved by the op's internal grid, but the base
                # sampling positions sit one pixel down-right of center --
                # a reference quirk reproduced by DeformConv2d(padding=0)
                x = DeformConv2d(self.out_ch, 3, padding=0,
                                 dtype=self.dtype, name=f"conv_{3*i}")(x)
            else:
                x = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv_{3*i}")(x)
            x = nn.relu(_bn(train, self.dtype, f"conv_{3*i+1}")(x))
        return x


class DUNetV1V2(nn.Module):
    n_channels: int = 3
    n_classes: int = 2
    downsize_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        f = lambda c: c // self.downsize_factor
        inp = x
        x1 = DoubleConv(f(64), dtype=dt, name="inc")(x, train)
        x2 = DoubleConv(f(128), deform=True, dtype=dt,
                        name="down1")(max_pool_nhwc(x1, (2, 2)), train)
        x3 = DoubleConv(f(256), deform=True, dtype=dt,
                        name="down2")(max_pool_nhwc(x2, (2, 2)), train)
        x4 = DoubleConv(f(512), dtype=dt,
                        name="down3")(max_pool_nhwc(x3, (2, 2)), train)
        x5 = DoubleConv(f(512), dtype=dt,
                        name="down4")(max_pool_nhwc(x4, (2, 2)), train)

        def up(v, skip, out_ch, deform, name):
            v = resize_linear_align_corners(v, (v.shape[1] * 2,
                                                v.shape[2] * 2))
            dh = skip.shape[1] - v.shape[1]
            dw = skip.shape[2] - v.shape[2]
            v = jnp.pad(v, ((0, 0), (dh // 2, dh - dh // 2),
                            (dw // 2, dw - dw // 2), (0, 0)))
            v = jnp.concatenate([skip, v], axis=-1)
            return DoubleConv(out_ch, deform=deform, dtype=dt,
                              name=name)(v, train)

        y = up(x5, x4, f(256), False, "up1")
        y = up(y, x3, f(128), False, "up2")
        y = up(y, x2, f(64), True, "up3")
        y = up(y, x1, f(64), True, "up4")
        y = jnp.concatenate([inp, y], axis=-1)
        return nn.Conv(self.n_classes, (1, 1), dtype=dt,
                       name="outc")(y).astype(jnp.float32)

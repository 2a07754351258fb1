"""UNet++ (NestedUNet) baseline (--net nestedunet).

Parity target: reference code/networks/nested_unet.py -- VGGBlocks over the
nested dense skip grid, bilinear align_corners=True upsampling, optional deep
supervision. Channels-last NHWC.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import max_pool_nhwc, resize_linear_align_corners


class VGGBlock(nn.Module):
    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        x = nn.Conv(self.mid, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(x)
        return nn.relu(bn("bn2")(x))


class NestedUNet(nn.Module):
    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = (32, 64, 128, 256, 512)
        dt = self.dtype
        pool = lambda v: max_pool_nhwc(v, (2, 2))
        up = lambda v: resize_linear_align_corners(
            v, (v.shape[1] * 2, v.shape[2] * 2))
        blk = lambda i, j, mid, out: VGGBlock(mid, out, dt,
                                              name=f"conv{i}_{j}")
        cat = lambda *vs: jnp.concatenate(vs, axis=-1)

        x0_0 = blk(0, 0, nb[0], nb[0])(x, train)
        x1_0 = blk(1, 0, nb[1], nb[1])(pool(x0_0), train)
        x0_1 = blk(0, 1, nb[0], nb[0])(cat(x0_0, up(x1_0)), train)
        x2_0 = blk(2, 0, nb[2], nb[2])(pool(x1_0), train)
        x1_1 = blk(1, 1, nb[1], nb[1])(cat(x1_0, up(x2_0)), train)
        x0_2 = blk(0, 2, nb[0], nb[0])(cat(x0_0, x0_1, up(x1_1)), train)
        x3_0 = blk(3, 0, nb[3], nb[3])(pool(x2_0), train)
        x2_1 = blk(2, 1, nb[2], nb[2])(cat(x2_0, up(x3_0)), train)
        x1_2 = blk(1, 2, nb[1], nb[1])(cat(x1_0, x1_1, up(x2_1)), train)
        x0_3 = blk(0, 3, nb[0], nb[0])(cat(x0_0, x0_1, x0_2, up(x1_2)), train)
        x4_0 = blk(4, 0, nb[4], nb[4])(pool(x3_0), train)
        x3_1 = blk(3, 1, nb[3], nb[3])(cat(x3_0, up(x4_0)), train)
        x2_2 = blk(2, 2, nb[2], nb[2])(cat(x2_0, x2_1, up(x3_1)), train)
        x1_3 = blk(1, 3, nb[1], nb[1])(cat(x1_0, x1_1, x1_2, up(x2_2)), train)
        x0_4 = blk(0, 4, nb[0], nb[0])(cat(x0_0, x0_1, x0_2, x0_3, up(x1_3)),
                                       train)
        if self.deep_supervision:
            outs = [nn.Conv(self.num_classes, (1, 1), dtype=dt,
                            name=f"final{i+1}")(v).astype(jnp.float32)
                    for i, v in enumerate((x0_1, x0_2, x0_3, x0_4))]
            return outs
        return nn.Conv(self.num_classes, (1, 1), dtype=dt,
                       name="final")(x0_4).astype(jnp.float32)

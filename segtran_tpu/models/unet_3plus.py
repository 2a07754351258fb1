"""UNet 3+ baseline (--net unet3plus): full-scale skip connections.

Parity target: reference code/networks/unet_3plus/unet_3plus.py -- 5-level
VGG encoder (unetConv2 = 2x conv+BN+ReLU), every decoder level hd_d fuses all
5 scales: encoder levels above are max-pooled down, decoder/bottleneck levels
below are bilinearly upsampled, each mapped to CatChannels=64 by
conv3x3+BN+ReLU, concatenated (5*64=320) and fused by conv3x3+BN+ReLU.
Channels-last NHWC.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import max_pool_nhwc, resize_linear


class UnetConv2(nn.Module):
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(x)
        return nn.relu(bn("bn2")(x))


class UNet3Plus(nn.Module):
    num_classes: int = 2
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        filters = (64, 128, 256, 512, 1024)
        cat_ch = filters[0]
        up_ch = cat_ch * 5

        def branch(v, name):
            bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=dt, name=f"{name}_bn")
            v = nn.Conv(cat_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                        name=f"{name}_conv")(v)
            return nn.relu(bn(v))

        # encoder
        h = [None] * 5
        h[0] = UnetConv2(filters[0], dt, name="conv1")(x, train)
        v = h[0]
        for i in range(1, 5):
            v = max_pool_nhwc(v, (2, 2))
            v = UnetConv2(filters[i], dt, name=f"conv{i+1}")(v, train)
            h[i] = v

        # decoder with full-scale skips; hd[4] is the bottleneck h[4]
        hd = {4: h[4]}
        for d in range(3, -1, -1):  # decoder levels hd4..hd1 (index 3..0)
            target_hw = h[d].shape[1:3]
            parts = []
            for s in range(5):
                if s < d:       # encoder above: maxpool down 2^(d-s)
                    k = 2 ** (d - s)
                    src = max_pool_nhwc(h[s], (k, k))
                    name = f"h{s+1}_PT_hd{d+1}"
                elif s == d:    # same scale: straight concat branch
                    src = h[s]
                    name = f"h{s+1}_Cat_hd{d+1}"
                else:           # below: upsample decoder/bottleneck 2^(s-d)
                    src = resize_linear(hd[s], target_hw)
                    name = f"hd{s+1}_UT_hd{d+1}"
                parts.append(branch(src, name))
            fused = jnp.concatenate(parts, axis=-1)
            bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=dt, name=f"bn{d+1}d_1")
            fused = nn.Conv(up_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name=f"conv{d+1}d_1")(fused)
            hd[d] = nn.relu(bn(fused))

        return nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=dt, name="outconv1")(hd[0]).astype(jnp.float32)

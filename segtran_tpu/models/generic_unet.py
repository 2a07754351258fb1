"""nnU-Net-style Generic_UNet baseline (--net nnunet).

Capability parity with the reference's external-pip nnunet wiring (reference
train2d.py:1004-1026 builds Generic_UNet(base=32, 7 stages, instance norm,
leaky ReLU, deep supervision)): configurable depth/width encoder-decoder with
instance norm + LeakyReLU(1e-2), stride-2 downsampling convs, transpose-conv
upsampling, and deep-supervision outputs (returned deepest-last like nnunet;
the reference trains on outputs[0], train2d.py:1216).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_linear


def _inorm(dtype, name):
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_bias=True, use_scale=True, dtype=dtype, name=name)


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv")(x)
        x = _inorm(self.dtype, "norm")(x)
        return nn.leaky_relu(x, 0.01)


class GenericUNet(nn.Module):
    num_classes: int = 2
    base_features: int = 32
    num_stages: int = 5
    max_features: int = 512
    deep_supervision: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        feats = [min(self.base_features * 2 ** i, self.max_features)
                 for i in range(self.num_stages)]
        skips: List = []
        for i, f in enumerate(feats):
            stride = 1 if i == 0 else 2
            x = _ConvBlock(f, stride, dt, name=f"enc{i}_a")(x)
            x = _ConvBlock(f, 1, dt, name=f"enc{i}_b")(x)
            skips.append(x)
        outputs = []
        for i in range(self.num_stages - 2, -1, -1):
            x = nn.ConvTranspose(feats[i], (2, 2), strides=(2, 2),
                                 use_bias=False, dtype=dt,
                                 name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = _ConvBlock(feats[i], 1, dt, name=f"dec{i}_a")(x)
            x = _ConvBlock(feats[i], 1, dt, name=f"dec{i}_b")(x)
            if self.deep_supervision or i == 0:
                logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                                 dtype=dt, name=f"seg{i}")(x)
                outputs.append(logits.astype(jnp.float32))
        outputs = outputs[::-1]  # full-resolution first (like nnunet)
        if self.deep_supervision:
            return tuple(outputs)
        return outputs[0]

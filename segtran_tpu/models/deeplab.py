"""DeepLabV3+ baseline (--net deeplabv3plus / deeplab-smp).

Capability parity with the reference's vendored deeplab (reference
code/networks/deeplab/: resnet backbone + ASPP (rates 12/24/36 + image
pooling) + the V3+ decoder that fuses a 48-channel projection of the
low-level features). Channels-last NHWC.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.backbones.resnet import ResNetFeatures
from ..ops.resize import resize_linear


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        k, d = self.kernel, self.dilation
        p = d * (k // 2)
        x = nn.Conv(self.features, (k, k), padding=((p, p), (p, p)),
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    features: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        branches = [_ConvBNReLU(self.features, 1, 1, self.dtype,
                                name="aspp0")(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(_ConvBNReLU(self.features, 3, r, self.dtype,
                                        name=f"aspp{i+1}")(x, train))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = _ConvBNReLU(self.features, 1, 1, self.dtype,
                         name="image_pool")(gp, train)
        gp = jnp.broadcast_to(gp, branches[0].shape)
        cat = jnp.concatenate(branches + [gp], axis=-1)
        out = _ConvBNReLU(self.features, 1, 1, self.dtype,
                          name="project")(cat, train)
        return nn.Dropout(0.5)(out, deterministic=not train)


class DeepLabV3Plus(nn.Module):
    num_classes: int = 2
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        feats = ResNetFeatures(variant=self.backbone, do_pool1=True,
                               dtype=dt, name="backbone")(x, train=train)
        low = feats[1]       # 1/4 resolution
        high = feats[4]      # 1/32 (the reference uses output-stride tricks;
        #                      plain strides + upsampling is the simple form)
        aspp = ASPP(dtype=dt, name="aspp")(high, train)
        aspp_up = resize_linear(aspp, low.shape[1:3])
        low_proj = _ConvBNReLU(48, 1, 1, dt, name="low_project")(low, train)
        cat = jnp.concatenate([aspp_up, low_proj], axis=-1)
        v = _ConvBNReLU(256, 3, 1, dt, name="decoder1")(cat, train)
        v = _ConvBNReLU(256, 3, 1, dt, name="decoder2")(v, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                         name="classifier")(v)
        return resize_linear(logits.astype(jnp.float32), (h, w))

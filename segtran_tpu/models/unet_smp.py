"""U-Net with a pretrained-capable encoder (--net unet).

Capability parity with the reference's vendored segmentation_models_pytorch
Unet (reference code/networks/segmentation_models_pytorch/, 5k LoC; selected
by --net unet, train2d.py:933-951): an EfficientNet/ResNet encoder (our
backbones, weight-convertible) with the standard SMP decoder -- per stage:
2x upsample, concat skip, 2x (conv3x3 + BN + ReLU).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.backbones.efficientnet import EfficientNetFeatures
from ..nn.backbones.resnet import ResNetFeatures
from ..ops.resize import resize_linear


class _DecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                skip = resize_linear(skip, x.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UnetSMP(nn.Module):
    num_classes: int = 2
    encoder: str = "eff-b4"
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        if self.encoder.startswith("eff-"):
            feats = EfficientNetFeatures(variant=self.encoder, stem_stride=2,
                                         dtype=dt,
                                         name="encoder")(x, train=train)
        else:
            feats = ResNetFeatures(variant=self.encoder, do_pool1=True,
                                   dtype=dt, name="encoder")(x, train=train)
        # deepest first; skips shallower
        v = feats[-1]
        skips = list(feats[:-1])[::-1] + [None]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            v = _DecoderBlock(ch, dt, name=f"decoder_{i}")(v, skip, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=dt, name="segmentation_head")(v)
        if logits.shape[1:3] != (h, w):
            logits = resize_linear(logits, (h, w))
        return logits.astype(jnp.float32)

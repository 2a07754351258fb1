"""TransUNet baseline (--net transunet): ResNet-hybrid ViT encoder + cup
decoder with skip connections.

Capability parity with the reference's vendored TransUNet (reference
code/networks/transunet/vit_seg_modeling.py: Embeddings with a ResNet hybrid
stem :122-166, 12-layer ViT :227-257, DecoderCup with 3 skips :326-368,
SegmentationHead :318-324). Built from the published R50-ViT-B/16
architecture as an idiomatic flax model (channels-last, fused attention).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.backbones.resnet import ResNetFeatures
from ..nn.vit import ViTEncoder
from ..ops.resize import resize_linear

_conv_relu = lambda f, k, dt, name: lambda x, bn: nn.relu(
    bn(nn.Conv(f, (k, k), padding=((k // 2,) * 2,) * 2, use_bias=False,
               dtype=dt, name=name)(x)))


class Conv2dReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                # our ResNet pyramid has the stem and layer1 at the same 1/4
                # scale (the original hybrid stem is stride-2 rooted); align
                # the skip to the decoder resolution
                skip = resize_linear(skip, x.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.features, 3, self.dtype, name="conv1")(x, train)
        return Conv2dReLU(self.features, 3, self.dtype,
                          name="conv2")(x, train)


class TransUNet(nn.Module):
    num_classes: int = 2
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 16)
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b, h, w, _ = x.shape
        # hybrid stem: ResNet features; skips from stages 0..2, tokens from
        # stage 3 (1/16 resolution)
        feats = ResNetFeatures(variant=self.backbone, do_pool1=True,
                               dtype=dt, name="hybrid_model")(x, train=train)
        skips = [feats[2], feats[1], feats[0]]  # 1/8, 1/4, 1/2... (desc res)
        tokens_in = feats[3]                    # [B, h/16, w/16, C]
        gh, gw = tokens_in.shape[1:3]
        t = nn.Conv(self.hidden_dim, (1, 1), dtype=dt,
                    name="patch_embeddings")(tokens_in)
        t = t.reshape(b, gh * gw, self.hidden_dim)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, gh * gw, self.hidden_dim))
        t = t + pos.astype(dt)
        t = nn.Dropout(0.1)(t, deterministic=not train)
        t = ViTEncoder(self.num_layers, self.num_heads, self.mlp_dim,
                       dtype=dt, name="encoder")(t, deterministic=not train)
        feat = t.reshape(b, gh, gw, self.hidden_dim)
        feat = Conv2dReLU(512, 3, dt, name="conv_more")(feat, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            feat = DecoderBlock(ch, dt, name=f"decoder_{i}")(feat, skip,
                                                             train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=dt, name="segmentation_head")(feat)
        if logits.shape[1:3] != (h, w):
            logits = resize_linear(logits, (h, w))
        return logits.astype(jnp.float32)

"""TransUNet baseline (--net transunet): ResNetV2-hybrid ViT encoder + cup
decoder with skip connections.

Faithful to the reference's vendored TransUNet so released/trained torch
checkpoints convert (reference code/networks/transunet/vit_seg_modeling.py:
Embeddings with the ResNetV2 hybrid stem :122-166, 12-layer pre-norm ViT
:168-257, DecoderCup :326-368, SegmentationHead :318-324; the hybrid stem is
vit_seg_modeling_resnet_skip.py: StdConv2d weight standardization :18-25,
PreActBottleneck :38-112, root+3-block body with the zero-pad skip quirk
:115-160). R50-ViT-B/16 config: resnet (3, 4, 9) x width 1, hidden 768,
12 layers/heads, mlp 3072 (vit_seg_configs.py:get_r50_b16_config).

Flax scope names mirror the torch attribute paths (Sequential indices become
name suffixes: ``conv_more.0`` -> ``conv_more_0``) so the generic converter
maps checkpoints; the attention kernels need only the transunet adapter's
[in, out] -> [in, heads, head_dim] reshape (convert/torch_import.py).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.vit import ViTEncoder
from ..ops.resize import resize_linear, resize_linear_align_corners


class StdConv(nn.Module):
    """Weight-standardized conv (reference StdConv2d: per-out-channel
    mean/var over (in, kh, kw), population variance, eps 1e-5)."""
    features: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features))
        m = kernel.mean(axis=(0, 1, 2), keepdims=True)
        v = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - m) / jnp.sqrt(v + 1e-5)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        import jax.lax as lax
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def _gn(groups, name, dtype):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype,
                        name=name)


class PreActBottleneck(nn.Module):
    """Reference PreActBottleneck (resnet_skip.py:38-75): NOT actually
    pre-activation -- conv then GN then relu, post-add relu, projection
    shortcut normalized by a per-channel GroupNorm(cout groups)."""
    cout: int
    cmid: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv(self.cout, 1, self.stride, 0, dtype=dt,
                               name="downsample")(x)
            residual = _gn(self.cout, "gn_proj", dt)(residual)
        y = nn.relu(_gn(32, "gn1", dt)(
            StdConv(self.cmid, 1, dtype=dt, name="conv1")(x)))
        y = nn.relu(_gn(32, "gn2", dt)(
            StdConv(self.cmid, 3, self.stride, 1, dtype=dt,
                    name="conv2")(y)))
        y = _gn(32, "gn3", dt)(
            StdConv(self.cout, 1, dtype=dt, name="conv3")(y))
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    """Reference ResNetV2 hybrid stem: root (k7 s2 + GN + relu), VALID
    maxpool k3 s2, 3 blocks; skip features are the root output plus each
    non-final block output zero-padded bottom-right to in_size/4/(i+1)
    (resnet_skip.py:142-158 -- the pool's pad=0 shrinks maps by 1)."""
    block_units: Tuple[int, ...] = (3, 4, 9)
    width_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        width = int(64 * self.width_factor)
        in_size = x.shape[1]
        x = StdConv(width, 7, 2, 3, dtype=dt, name="root_conv")(x)
        x = nn.relu(_gn(32, "root_gn", dt)(x))
        features = [x]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        widths = [(width * 4, width), (width * 8, width * 2),
                  (width * 16, width * 4)]
        for bi, (units, (cout, cmid)) in enumerate(
                zip(self.block_units, widths)):
            for ui in range(units):
                x = PreActBottleneck(
                    cout, cmid, stride=2 if (ui == 0 and bi > 0) else 1,
                    dtype=dt, name=f"body_block{bi+1}_unit{ui+1}")(x)
            if bi < len(self.block_units) - 1:
                right = in_size // 4 // (bi + 1)
                pad_h = right - x.shape[1]
                pad_w = right - x.shape[2]
                assert 0 <= pad_h < 3 and 0 <= pad_w < 3, \
                    f"skip {x.shape} should be {right}"
                feat = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                features.append(feat)
        return x, features[::-1]


def _conv_bn_relu(x, features, prefix, dtype, train):
    """Conv2dReLU Sequential twin created at the CALLER's scope:
    ``{prefix}_0`` conv (no bias) + ``{prefix}_1`` BatchNorm + relu
    (vit_seg_modeling.py:259-281)."""
    x = nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=dtype, name=f"{prefix}_0")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, name=f"{prefix}_1")(x)
    return nn.relu(x)


class _DecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        # UpsamplingBilinear2d == align_corners=True
        x = resize_linear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = _conv_bn_relu(x, self.features, "conv1", self.dtype, train)
        return _conv_bn_relu(x, self.features, "conv2", self.dtype, train)


class TransUNet(nn.Module):
    """R50-ViT-B/16 TransUNet (reference VisionTransformer wiring,
    vit_seg_modeling.py:370-420; train2d.py:975-983 sets patches.grid =
    patch_size/16, making the patch embedding a 1x1 conv)."""
    num_classes: int = 2
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 16)
    n_skip: int = 3
    resnet_units: Tuple[int, ...] = (3, 4, 9)
    backbone: str = "resnetv2-50"   # fixed hybrid; kept for CLI signature
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b, h, w, _ = x.shape
        tokens_in, features = ResNetV2(self.resnet_units, dtype=dt,
                                       name="hybrid_model")(x)
        gh, gw = tokens_in.shape[1:3]
        t = nn.Conv(self.hidden_dim, (1, 1), use_bias=True, dtype=dt,
                    name="patch_embeddings")(tokens_in)
        t = t.reshape(b, gh * gw, self.hidden_dim)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, gh * gw, self.hidden_dim))
        t = t + pos.astype(dt)
        t = nn.Dropout(0.1)(t, deterministic=not train)
        t = ViTEncoder(self.num_layers, self.num_heads, self.mlp_dim,
                       dtype=dt, name="encoder")(t, deterministic=not train)
        feat = t.reshape(b, gh, gw, self.hidden_dim)
        feat = _conv_bn_relu(feat, 512, "conv_more", dt, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = features[i] if i < self.n_skip else None
            feat = _DecoderBlock(ch, dt, name=f"blocks_{i}")(feat, skip,
                                                             train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         use_bias=True, dtype=dt,
                         name="segmentation_head_0")(feat)
        if logits.shape[1:3] != (h, w):
            logits = resize_linear(logits, (h, w))
        return logits.astype(jnp.float32)

"""DeepLabV3 / V3+ baselines (--net deeplabv3 / deeplabv3plus).

Faithful to the reference's vendored deeplab (reference code/networks/
deeplab/): torchvision-style dilated ResNet backbone (output_stride 8:
replace_stride_with_dilation=[False, True, True], aspp rates 12/24/36;
modeling.py:6-31), ASPP with 1x1 + three atrous branches + image pooling and
a projection w/ dropout 0.1 (_deeplab.py:134-163), the V3+ head that fuses a
48-channel projection of layer1 (_deeplab.py:28-52, concat order
[low, aspp]), the V3 head (_deeplab.py:63-77), and bilinear
align_corners=False resizes (utils.py:14-23). Scope names mirror the torch
attribute paths so the converter maps checkpoints (the only adapter is the
ASPP ModuleList rename, convert/torch_import.py rename_deeplab_key).

The reference also builds mobilenet-backed variants (modeling.py:94-140);
this port covers the resnet50/101 ones the paper and shipped recipes use.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.backbones.resnet import ResNetFeatures
from ..ops.resize import resize_linear


def _conv_bn_relu(x, feats, k, dilation, prefix, dtype, train,
                  conv_idx=0):
    """torch Sequential(conv, bn, relu) twin at the caller's scope:
    ``{prefix}_{i}`` conv + ``{prefix}_{i+1}`` BatchNorm."""
    p = dilation * (k // 2)
    x = nn.Conv(feats, (k, k), padding=((p, p), (p, p)),
                kernel_dilation=(dilation, dilation), use_bias=False,
                dtype=dtype, name=f"{prefix}_{conv_idx}")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype,
                     name=f"{prefix}_{conv_idx + 1}")(x)
    return nn.relu(x)


class ASPP(nn.Module):
    """_deeplab.py:134-163. Branch scopes: convs{i}_{j} where j is the
    torch Sequential index (pooling branch: pool has no params, so its conv
    is convs4_1 and bn convs4_2)."""
    rates: Tuple[int, ...] = (12, 24, 36)
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        dt = self.dtype
        res = [_conv_bn_relu(x, self.features, 1, 1, "convs0", dt, train)]
        for i, r in enumerate(self.rates):
            res.append(_conv_bn_relu(x, self.features, 3, r, f"convs{i+1}",
                                     dt, train))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = _conv_bn_relu(gp, self.features, 1, 1, "convs4", dt, train,
                           conv_idx=1)
        # F.interpolate of a 1x1 map == broadcast (_deeplab.py:129-132)
        res.append(jnp.broadcast_to(gp, res[0].shape))
        out = _conv_bn_relu(jnp.concatenate(res, axis=-1), self.features, 1,
                            1, "project", dt, train)
        return nn.Dropout(0.1)(out, deterministic=not train)


class _V3PlusHead(nn.Module):
    """DeepLabHeadV3Plus (_deeplab.py:28-52): 48-ch projection of layer1,
    ASPP on layer4, upsample, concat [low, aspp], 3x3+1x1 classifier."""
    num_classes: int
    rates: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low, out, train=False):
        dt = self.dtype
        low_proj = _conv_bn_relu(low, 48, 1, 1, "project", dt, train)
        aspp = ASPP(self.rates, dtype=dt, name="aspp")(out, train)
        aspp_up = resize_linear(aspp, low_proj.shape[1:3])
        cat = jnp.concatenate([low_proj, aspp_up.astype(low_proj.dtype)],
                              axis=-1)
        v = _conv_bn_relu(cat, 256, 3, 1, "classifier", dt, train)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt,
                       name="classifier_3")(v)


class _V3Head(nn.Module):
    """DeepLabHead (_deeplab.py:63-77): Sequential(ASPP, 3x3, bn, relu,
    1x1) -> scopes classifier_0 (ASPP), classifier_1/2, classifier_4."""
    num_classes: int
    rates: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, out, train=False):
        dt = self.dtype
        v = ASPP(self.rates, dtype=dt, name="classifier_0")(out, train)
        v = _conv_bn_relu(v, 256, 3, 1, "classifier", dt, train, conv_idx=1)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt,
                       name="classifier_4")(v)


class DeepLabV3Plus(nn.Module):
    """deeplabv3plus_resnet{50,101} (modeling.py:107-128)."""
    num_classes: int = 2
    backbone: str = "resnet50"
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        dilated = ((False, True, True) if self.output_stride == 8
                   else (False, False, True))
        rates = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        feats = ResNetFeatures(variant=self.backbone, do_pool1=True,
                               replace_stride_with_dilation=dilated,
                               dtype=dt, name="backbone")(x, train=train)
        logits = _V3PlusHead(self.num_classes, rates, dt,
                             name="classifier")(feats[1], feats[4], train)
        return resize_linear(logits.astype(jnp.float32), (h, w))


class DeepLabV3(nn.Module):
    """deeplabv3_resnet{50,101} (modeling.py:74-93)."""
    num_classes: int = 2
    backbone: str = "resnet50"
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        dilated = ((False, True, True) if self.output_stride == 8
                   else (False, False, True))
        rates = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        feats = ResNetFeatures(variant=self.backbone, do_pool1=True,
                               replace_stride_with_dilation=dilated,
                               dtype=dt, name="backbone")(x, train=train)
        logits = _V3Head(self.num_classes, rates, dt,
                         name="classifier")(feats[4], train)
        return resize_linear(logits.astype(jnp.float32), (h, w))

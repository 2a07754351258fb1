"""Vanilla U-Net (the Polyformer host network).

Parity target: reference code/networks/unet2d/ (unet_model.py, unet_parts.py):
DoubleConv (conv3x3+BN+ReLU x2), Down (maxpool + DoubleConv), Up (bilinear
align_corners=True upsample + center-pad + concat + DoubleConv), OutConv, and
the optional Polyformer inserted before outc (unet_model.py:30-54).

Param scopes mirror torch Sequential indices (inc/double_conv_0 == torch
'inc.double_conv.0') so the generic converter maps U-Net checkpoints.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..adapt.polyformer import Polyformer
from ..ops.resize import max_pool_nhwc, resize_linear_align_corners


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: Optional[int] = None
    bn_axis_name: Optional[str] = None
    bn_eval: bool = False   # --bnopt fixstats: freeze running statistics
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        bn = lambda name: nn.BatchNorm(use_running_average=(not train)
                                       or self.bn_eval,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype,
                                       axis_name=self.bn_axis_name, name=name)
        x = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="double_conv_0")(x)
        x = nn.relu(bn("double_conv_1")(x))
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="double_conv_3")(x)
        return nn.relu(bn("double_conv_4")(x))


class Down(nn.Module):
    out_channels: int
    bn_axis_name: Optional[str] = None
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool_nhwc(x, (2, 2))
        return DoubleConv(self.out_channels, bn_axis_name=self.bn_axis_name,
                          bn_eval=self.bn_eval, dtype=self.dtype,
                          name="maxpool_conv_1")(x, train)


class Up(nn.Module):
    out_channels: int
    bilinear: bool = True
    bn_axis_name: Optional[str] = None
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if self.bilinear:
            x1 = resize_linear_align_corners(
                x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        else:
            x1 = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="up")(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        # torch DoubleConv(in_channels, out, in_channels//2): mid is half of
        # the concatenated channels (unet_parts.py:49-53)
        mid = (x.shape[-1] // 2) if self.bilinear else None
        return DoubleConv(self.out_channels, mid_channels=mid,
                          bn_axis_name=self.bn_axis_name,
                          bn_eval=self.bn_eval, dtype=self.dtype,
                          name="conv")(x, train)


class OutConv(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv")(x)


class VanillaUNet(nn.Module):
    """reference unet_model.py UNet; polyformer_mode in {None, 'source',
    'target'} controls the adapter's QK tying."""
    n_channels: int = 3
    num_classes: int = 3
    bilinear: bool = True
    polyformer_mode: Optional[str] = None
    num_attractors: int = 256
    num_modes: int = 4
    bn_axis_name: Optional[str] = None
    bn_eval: bool = False   # --bnopt fixstats (reference train2d.py:1089-1104)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, bn_eval=self.bn_eval,
                  dtype=self.dtype)
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64, name="inc", **kw)(x, train)
        x2 = Down(128, name="down1", **kw)(x1, train)
        x3 = Down(256, name="down2", **kw)(x2, train)
        x4 = Down(512, name="down3", **kw)(x3, train)
        x5 = Down(1024 // factor, name="down4", **kw)(x4, train)
        y = Up(512 // factor, self.bilinear, name="up1", **kw)(x5, x4, train)
        y = Up(256 // factor, self.bilinear, name="up2", **kw)(y, x3, train)
        y = Up(128 // factor, self.bilinear, name="up3", **kw)(y, x2, train)
        y = Up(64, self.bilinear, name="up4", **kw)(y, x1, train)
        if self.polyformer_mode:
            tie = "shared" if self.polyformer_mode == "source" else "loose"
            y = Polyformer(feat_dim=64, num_attractors=self.num_attractors,
                           num_modes=self.num_modes, tie_qk_scheme=tie,
                           dtype=self.dtype,
                           name="polyformer")(y, deterministic=not train)
        # the reference's feature_maps[-1] used by DA / recon heads
        self.sow("intermediates", "pre_outc_feat", y)
        logits = OutConv(self.num_classes, dtype=self.dtype, name="outc")(y)
        return logits.astype(jnp.float32)

"""Modified 3D U-Net baseline (--net unet for 3D tasks).

Parity target: reference code/networks/unet3d.py Modified3DUNet: context
pathway with residual blocks + instance norm + leaky ReLU, localization
pathway with nearest-neighbor upscales and deep supervision (ds2/ds3 summed
into the logits). Channels-last [B, H, W, D, C].
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _inorm(dtype, name=None):
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_bias=False, use_scale=False, dtype=dtype,
                        name=name)


def _conv(f, k, s, dtype, name=None):
    p = ((k // 2, k // 2),) * 3
    return nn.Conv(f, (k, k, k), strides=(s, s, s), padding=p,
                   use_bias=False, dtype=dtype, name=name)


def _upscale_nearest(x):
    b, h, w, d, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


class Modified3DUNet(nn.Module):
    in_channels: int = 4
    num_classes: int = 4
    base_n_filter: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bf = self.base_n_filter
        lrelu = lambda v: nn.leaky_relu(v, 0.01)
        # torch Dropout3d drops whole channels -> broadcast over spatial dims
        drop = lambda v: nn.Dropout(0.6, broadcast_dims=(1, 2, 3))(
            v, deterministic=not train)

        def make_norm_lrelu_conv(f, scope):
            """One IN+LReLU+Conv Sequential; the reference APPLIES EACH OF
            THESE TWICE with shared weights (unet3d.py:115-118 calls
            self.norm_lrelu_conv_c2 twice around the dropout -- a quirk
            reproduced here by reusing the module)."""
            conv = _conv(f, 3, 1, dt, scope)

            def apply(v):
                v = _inorm(dt)(v)
                return conv(lrelu(v))
            return apply

        def conv_norm_lrelu(v, f, scope):
            v = _conv(f, 3, 1, dt, scope)(v)
            return lrelu(_inorm(dt)(v))

        def up_block(v, f_out, scope):
            v = lrelu(_inorm(dt)(v))
            v = _upscale_nearest(v)
            v = _conv(f_out, 3, 1, dt, scope)(v)
            return lrelu(_inorm(dt)(v))

        # context pathway (residual blocks, reference :97-150)
        out = _conv(bf, 3, 1, dt, "conv3d_c1_1")(x)
        residual_1 = out
        out = lrelu(out)
        out = _conv(bf, 3, 1, dt, "conv3d_c1_2")(out)
        out = drop(out)
        out = _conv(bf, 3, 1, dt, "lrelu_conv_c1")(lrelu(out))
        out = out + residual_1
        context_1 = lrelu(out)
        out = lrelu(_inorm(dt, "inorm3d_c1")(out))

        def context_level(v, f, scope):
            v = _conv(f, 3, 2, dt, f"conv3d_{scope}")(v)
            res = v
            nlc = make_norm_lrelu_conv(f, f"norm_lrelu_conv_{scope}")
            v = nlc(v)
            v = drop(v)
            v = nlc(v)
            v = v + res
            v = _inorm(dt, f"inorm3d_{scope}")(v)
            return lrelu(v)

        out = context_level(out, bf * 2, "c2")
        context_2 = out
        out = context_level(out, bf * 4, "c3")
        context_3 = out
        out = context_level(out, bf * 8, "c4")
        context_4 = out
        out = _conv(bf * 16, 3, 2, dt, "conv3d_c5")(out)
        res5 = out
        nlc5 = make_norm_lrelu_conv(bf * 16, "norm_lrelu_conv_c5")
        out = nlc5(out)
        out = drop(out)
        out = nlc5(out)
        out = out + res5
        out = up_block(out, bf * 8, "up_l0")

        out = _conv(bf * 8, 1, 1, dt, "conv3d_l0")(out)
        out = lrelu(_inorm(dt, "inorm3d_l0")(out))

        # localization pathway with deep supervision (reference :150-192)
        out = jnp.concatenate([out, context_4], axis=-1)
        out = conv_norm_lrelu(out, bf * 16, "conv_norm_lrelu_l1")
        out = _conv(bf * 8, 1, 1, dt, "conv3d_l1")(out)
        out = up_block(out, bf * 4, "up_l1")

        out = jnp.concatenate([out, context_3], axis=-1)
        ds2 = conv_norm_lrelu(out, bf * 8, "conv_norm_lrelu_l2")
        out = _conv(bf * 4, 1, 1, dt, "conv3d_l2")(ds2)
        out = up_block(out, bf * 2, "up_l2")

        out = jnp.concatenate([out, context_2], axis=-1)
        ds3 = conv_norm_lrelu(out, bf * 4, "conv_norm_lrelu_l3")
        out = _conv(bf * 2, 1, 1, dt, "conv3d_l3")(ds3)
        out = up_block(out, bf, "up_l3")

        out = jnp.concatenate([out, context_1], axis=-1)
        out = conv_norm_lrelu(out, bf * 2, "conv_norm_lrelu_l4")
        out_pred = _conv(self.num_classes, 1, 1, dt, "conv3d_l4")(out)

        ds2_logits = _conv(self.num_classes, 1, 1, dt, "ds2_1x1_conv3d")(ds2)
        ds2_up = _upscale_nearest(ds2_logits)
        ds3_logits = _conv(self.num_classes, 1, 1, dt, "ds3_1x1_conv3d")(ds3)
        ds_sum = _upscale_nearest(ds2_up + ds3_logits)
        return (out_pred + ds_sum).astype(jnp.float32)

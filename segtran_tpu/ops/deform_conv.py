"""Deformable convolution v1/v2 as pure JAX (gather + bilinear sampling).

Capability parity with the reference's pure-PyTorch DeformConv2d (reference
code/networks/deformable_unet/deform_conv_v2.py): an offset conv predicts
2*k*k per-pixel offsets (zero-initialized so the op starts as a regular
conv), input is bilinearly sampled at the offset kernel positions, optional
sigmoid modulation (DCNv2), then a dense conv over the sampled taps.

TPU-first: sampling is expressed as k*k batched bilinear gathers (XLA lowers
to vectorized dynamic-gathers) followed by ONE dense matmul over the
(k*k*C_in) taps -- no per-pixel loops.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; y, x: [h, w] float coords. Zero padding outside."""
    h, w = img.shape[:2]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]

    def tap(yy, xx):
        valid = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return img[yi, xi] * valid[..., None]

    return (tap(y0, x0) * (1 - fy) * (1 - fx)
            + tap(y0, x0 + 1) * (1 - fy) * fx
            + tap(y0 + 1, x0) * fy * (1 - fx)
            + tap(y0 + 1, x0 + 1) * fy * fx)


class DeformConv2d(nn.Module):
    """x: [B, H, W, C] -> [B, H', W', features] with learned offsets."""
    features: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    modulation: bool = False
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        n = k * k
        offsets = nn.Conv(2 * n, (3, 3), strides=(self.stride,) * 2,
                          padding=((1, 1), (1, 1)),
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="p_conv")(x)
        if self.modulation:
            mod = nn.Conv(n, (3, 3), strides=(self.stride,) * 2,
                          padding=((1, 1), (1, 1)),
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="m_conv")(x)
            mod = jax.nn.sigmoid(mod)
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding,) * 2,
                            (self.padding,) * 2, (0, 0)))
        b, hp, wp, c = x.shape
        ho, wo = offsets.shape[1:3]
        # base grid (top-left kernel origin, like the reference's _get_p)
        gy = jnp.arange(ho) * self.stride
        gx = jnp.arange(wo) * self.stride
        base_y = jnp.broadcast_to(gy[:, None], (ho, wo)).astype(jnp.float32)
        base_x = jnp.broadcast_to(gx[None, :], (ho, wo)).astype(jnp.float32)
        off = offsets.reshape(b, ho, wo, 2, n).astype(jnp.float32)

        def sample_one(img, off_b):
            taps = []
            for t in range(n):
                dy, dx = t // k, t % k
                y = base_y + dy + off_b[..., 0, t]
                xx = base_x + dx + off_b[..., 1, t]
                taps.append(_bilinear_sample(img, y, xx))
            return jnp.stack(taps, axis=-2)   # [ho, wo, n, C]

        sampled = jax.vmap(sample_one)(x, off)  # [B, ho, wo, n, C]
        if self.modulation:
            sampled = sampled * mod[..., None]
        sampled = sampled.reshape(b, ho, wo, n * c).astype(self.dtype)
        # dense conv over taps == the reference's stride-k conv on the
        # resampled k-times-enlarged grid
        kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (n * c, self.features))
        out = sampled @ kernel.astype(self.dtype)
        if self.use_bias:
            out = out + self.param("conv_bias", nn.initializers.zeros,
                                   (self.features,)).astype(self.dtype)
        return out

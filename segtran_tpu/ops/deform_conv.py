"""Deformable convolution v1/v2 as pure JAX (gather + bilinear sampling).

Numerics parity with the reference's pure-PyTorch DeformConv2d (reference
code/networks/deformable_unet/deform_conv_v2.py): an offset conv predicts
2*k*k per-pixel offsets (zero-initialized weight so the op starts near a
regular conv), the input is bilinearly sampled at the offset kernel
positions, optional sigmoid modulation (DCNv2), then a dense contraction
over the sampled taps (== the reference's stride-k conv over the k-times
enlarged resampled grid, deform_conv_v2.py:86-87,139-143).

Reference quirks reproduced exactly:
  * Sample coordinates CLAMP to the image border (deform_conv_v2.py:53-59)
    rather than zeroing out-of-range taps; because the four bilinear corner
    weights are computed from the independently clamped corners
    (:63-66), a point clamped to the bottom/right border double-counts
    (g_lt and g_rb both reach 1 when p lands exactly on the upper edge).
  * The base sampling grid is centered at i+1 (p_0 starts at 1,
    :101-109) in the frame padded by ``padding``. The reference model wires
    its deform convs with padding=0 (deform_part.py:12,16), so their
    receptive field is shifted one pixel down-right relative to a centered
    conv -- callers wanting that parity must pass padding=0.

TPU-first: sampling is expressed as k*k batched bilinear gathers (XLA lowers
to vectorized dynamic-gathers) followed by ONE dense matmul over the
(k*k*C_in) taps -- no per-pixel loops. ``conv_kernel`` is stored
[(dr*k+dc)*C_in + c, features]; the converter reshapes the reference's
[O, I, k, k] conv weight with transpose(2,3,1,0).reshape(k*k*I, O).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample_ref(img: jnp.ndarray, y: jnp.ndarray,
                         x: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; y, x: [h, w] float coords. Border-clamped sampling
    with the reference's corner-weight formula (deform_conv_v2.py:51-76)."""
    h, w = img.shape[:2]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    yc = jnp.clip(y, 0, h - 1)
    xc = jnp.clip(x, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    g_lt = (1 + (y0c - yc)) * (1 + (x0c - xc))
    g_rb = (1 - (y1c - yc)) * (1 - (x1c - xc))
    g_lb = (1 + (y0c - yc)) * (1 - (x1c - xc))
    g_rt = (1 - (y1c - yc)) * (1 + (x0c - xc))

    def at(yy, xx):
        return img[yy.astype(jnp.int32), xx.astype(jnp.int32)]

    return (g_lt[..., None] * at(y0c, x0c)
            + g_rb[..., None] * at(y1c, x1c)
            + g_lb[..., None] * at(y0c, x1c)
            + g_rt[..., None] * at(y1c, x0c))


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
        # base grid: tap (dr, dc) samples at i*stride + dr (+ offset), i.e.
        # centered at i*stride+1 like the reference's p_0 + p_n
        gy = jnp.arange(ho) * self.stride
        gx = jnp.arange(wo) * self.stride
        base_y = jnp.broadcast_to(gy[:, None], (ho, wo)).astype(jnp.float32)
        base_x = jnp.broadcast_to(gx[None, :], (ho, wo)).astype(jnp.float32)
        # reference offset layout: first n channels are row offsets, last n
        # are column offsets (p_n_x indexes dim 2 == rows, _get_x_q:127)
        off = offsets.reshape(b, ho, wo, 2, n).astype(jnp.float32)

        def sample_one(img, off_b):
            taps = []
            for t in range(n):
                dy, dx = t // k, t % k
                y = base_y + dy + off_b[..., 0, t]
                xx = base_x + dx + off_b[..., 1, t]
                taps.append(_bilinear_sample_ref(img, y, xx))
            return jnp.stack(taps, axis=-2)   # [ho, wo, n, C]

        sampled = jax.vmap(sample_one)(x, off)  # [B, ho, wo, n, C]
        if self.modulation:
            sampled = sampled * mod[..., None]
        sampled = sampled.reshape(b, ho, wo, n * c).astype(self.dtype)
        # dense contraction over taps == the reference's stride-k conv on
        # the resampled k-times-enlarged grid (deform_conv_v2.py:139-143)
        kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (n * c, self.features))
        out = sampled @ kernel.astype(self.dtype)
        if self.use_bias:
            out = out + self.param("conv_bias", nn.initializers.zeros,
                                   (self.features,)).astype(self.dtype)
        return out

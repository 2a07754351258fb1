"""Torch-compatible spatial resize for channels-last tensors.

The reference uses ``F.interpolate(mode='bilinear'/'trilinear',
align_corners=False)`` throughout (e.g. segtran2d.py:249-251, 305-306,
435-436; segtran3d.py depth pooling). PyTorch's align_corners=False samples at
half-pixel centers with no antialiasing filter; ``jax.image.resize`` with a
linear method and ``antialias=False`` implements the same sampling, so these
wrappers reduce to a single fused XLA gather/convolution on TPU.

All helpers operate on channels-last arrays (NHWC / NDHWC), the native TPU
layout.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_linear(x: jnp.ndarray, spatial_size: Sequence[int]) -> jnp.ndarray:
    """Bilinear (2 spatial dims) / trilinear (3) resize, half-pixel centers.

    x: [B, *spatial, C] channels-last. Returns [B, *spatial_size, C].
    Matches torch ``F.interpolate(..., mode='bilinear'|'trilinear',
    align_corners=False)`` on the channels-first equivalent.
    """
    spatial_size = tuple(int(s) for s in spatial_size)
    n_sp = len(spatial_size)
    assert x.ndim == n_sp + 2, (x.shape, spatial_size)
    if x.shape[1:-1] == spatial_size:
        return x
    out_shape = (x.shape[0],) + spatial_size + (x.shape[-1],)
    # 'linear' in jax.image.resize is separable multilinear in every resized dim;
    # batch/channel dims keep their size so they are passed through untouched.
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def resize_to(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Resize x's spatial dims to match `like`'s spatial dims (channels-last)."""
    return resize_linear(x, like.shape[1:-1])


def interpolate_channels_last(x: jnp.ndarray,
                              scale: float | Tuple[float, ...]) -> jnp.ndarray:
    """Scale-factor form of resize_linear (torch semantics: floor(in * scale))."""
    n_sp = x.ndim - 2
    if isinstance(scale, (int, float)):
        scale = (scale,) * n_sp
    new_size = tuple(int(s * f) for s, f in zip(x.shape[1:-1], scale))
    return resize_linear(x, new_size)


def _align_corners_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] linear-interp matrix with align_corners=True sampling
    (src = i * (n_in-1)/(n_out-1)). Static shapes -> a constant; XLA lowers
    the application to an MXU matmul."""
    if n_in == n_out:
        return jnp.eye(n_out)
    if n_out == 1:
        m = jnp.zeros((1, n_in)).at[0, 0].set(1.0)
        return m
    src = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = src - lo
    m = jnp.zeros((n_out, n_in))
    m = m.at[jnp.arange(n_out), lo].add(1.0 - frac)
    m = m.at[jnp.arange(n_out), hi].add(frac)
    return m


def resize_linear_align_corners(x: jnp.ndarray,
                                spatial_size: Sequence[int]) -> jnp.ndarray:
    """Bilinear/trilinear resize with torch align_corners=True semantics
    (used by the reference's vanilla U-Net upsampling,
    unet2d/unet_parts.py:50). Channels-last [B, *spatial, C]."""
    spatial_size = tuple(int(s) for s in spatial_size)
    n_sp = len(spatial_size)
    assert x.ndim == n_sp + 2
    if x.shape[1:-1] == spatial_size:
        return x
    for axis, n_out in zip(range(1, 1 + n_sp), spatial_size):
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        m = _align_corners_matrix(n_in, n_out).astype(x.dtype)
        x = jnp.moveaxis(jnp.tensordot(m, x, axes=[[1], [axis]]), 0, axis)
    return x


def avg_pool_nhwc(x: jnp.ndarray, window: Sequence[int]) -> jnp.ndarray:
    """Non-overlapping average pool over the spatial dims of a channels-last
    tensor (torch nn.AvgPool2d/3d with stride == kernel)."""
    window = tuple(int(w) for w in window)
    n_sp = len(window)
    assert x.ndim == n_sp + 2
    dims = (1,) + window + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, dims, "VALID")
    denom = 1.0
    for w in window:
        denom *= w
    return summed / denom


def max_pool_nhwc(x: jnp.ndarray, window: Sequence[int],
                  strides: Sequence[int] | None = None,
                  padding="VALID") -> jnp.ndarray:
    """Max pool over spatial dims of a channels-last tensor."""
    window = tuple(int(w) for w in window)
    strides = tuple(int(s) for s in (strides or window))
    n_sp = len(window)
    assert x.ndim == n_sp + 2
    dims = (1,) + window + (1,)
    strd = (1,) + strides + (1,)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = ((0, 0),) + tuple(padding) + ((0, 0),)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strd, pad)

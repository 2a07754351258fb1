"""Depthwise 2D convolution as a shifted-slice stencil (TPU-idiomatic).

Why not ``lax.conv_general_dilated(feature_group_count=C)``: profiling the
eff-b4 288^2 train step (round 4, _prof_hbm.py on the optimized HLO) showed
XLA's TPU lowering of depthwise convs -- and especially their BACKWARD --
decomposes into hundreds of materialized sliced ops (e.g. 229 instances of
bf16[144,48,18,192] for one segment), making the backbone backward move
~95 GB of HBM for ~0.3 TFLOP and dominating the whole train step.

A depthwise conv is K*K shifted elementwise multiply-adds. Expressing it
that way keeps every op an elementwise/slice op: XLA fuses the whole stencil
(and the surrounding BatchNorm/silu chains) into single-pass loops, the VPU
does the FLOPs (there are almost none), no conv-specific tiled layouts are
forced on neighbours, and the autodiff transpose is again a stencil with the
same properties. Numerics: identical contraction up to tap-summation order
(K^2 adds reassociated).

The kernel layout matches flax ``nn.Conv(feature_group_count=C)`` exactly --
``[kh, kw, 1, C]`` -- so parameters created by the stencil path are
checkpoint-compatible with the conv path in both directions.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def depthwise_conv2d_stencil(x: jnp.ndarray, w: jnp.ndarray,
                             stride: Tuple[int, int],
                             pad: Tuple[Tuple[int, int], Tuple[int, int]],
                             ) -> jnp.ndarray:
    """x: [B, H, W, C]; w: [kh, kw, 1, C] (flax depthwise layout).
    pad: ((top, bottom), (left, right)) explicit zero-pad (TF-SAME pads are
    precomputed statically upstream, nn/backbones/efficientnet.py).
    Returns [B, H_out, W_out, C]."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    sh, sw = stride
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    ho = (hp - kh) // sh + 1
    wo = (wp - kw) // sw + 1
    out = None
    for i in range(kh):
        for j in range(kw):
            sl = xp[:, i:i + (ho - 1) * sh + 1:sh,
                    j:j + (wo - 1) * sw + 1:sw, :]
            t = sl * w[i, j, 0]
            out = t if out is None else out + t
    return out

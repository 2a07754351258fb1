"""Factored (reassociated) segmentation head for the output FPN tail.

The reference's out-FPN tail (segtran2d.py:273-312, segtran3d.py:336-396)
computes, at the out-FPN's spatial resolution and full transformer width C:

    scores = out_conv( bridge(curr) + upsample(vfeat_fused) )   # C channels

On a whole BraTS volume that materializes several [B, D, H, W, 1024] tensors
(>1 GB each); the measured forward moves ~60 GB of HBM traffic for 3 TFLOP —
bandwidth-bound by a factor of ~2.4. But every op in the tail is LINEAR when
dropout is off: ``out_conv`` and ``bridge`` are 1x1 convs (pointwise channel
maps) and ``upsample``/depth-unpool 'interp'/transposes are channel-pointwise
spatial maps, so they commute/compose:

    scores = (bridge . out_conv)(curr) + upsample( out_conv_nobias(vfeat) )

which runs every full-resolution op at ``num_classes`` channels instead of C
(256x less traffic on the tail) and applies ``out_conv`` on the small fused
grid. The result is mathematically identical (same linear map, reassociated);
parity tests cover the factored path against the torch oracle.

``Conv1x1Params`` declares the SAME parameter layout as ``nn.Conv`` (kernel
[1,..,1,in,out] + bias, lecun_normal/zeros inits) under the SAME module
names, so checkpoints are interchangeable between the factored and exact
paths and the exact path can still run (training with out-FPN dropout, the
2.5D 'conv' depth-unpool scheme).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Conv1x1Params(nn.Module):
    """nn.Conv-compatible (kernel, bias) for a 1x1[x1] conv, without applying
    it — lets the caller compose pointwise channel maps algebraically."""
    features: int
    spatial_ndim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kshape = (1,) * self.spatial_ndim + (in_features, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return kernel.reshape(in_features, self.features), bias


def compose_1x1(w_first: jnp.ndarray, b_first, w_second: jnp.ndarray,
                b_second):
    """Weights of ``second(first(x))`` for pointwise channel maps:
    x @ (W1 W2) + (b1 W2 + b2)."""
    w = w_first @ w_second
    b = b_second if b_first is None else b_first @ w_second + (
        0.0 if b_second is None else b_second)
    return w, b


def apply_pointwise(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """x [..., Cin] @ w [Cin, Cout] (+ b) in x.dtype."""
    y = jnp.einsum("...c,cf->...f", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def compose_fold_head(w_u: jnp.ndarray, b_u, w_o: jnp.ndarray, b_o,
                      K: int):
    """Compose the 'conv' depth-unpool channel-fold with the 1x1 head.

    The fold layer maps C -> F*K where output channel o = f*K + k
    (segtran3d.py:376-379 / segtran25d.py:362-366), each depth slot k then
    goes through out_conv W_o [F, ncls]. Composed pointwise map:
        W[c, k*ncls + cls] = sum_f w_u[c, f*K + k] * w_o[f, cls]
    Returns (W [C, K*ncls], b [K*ncls]); the caller reshapes the K*ncls
    channels into the depth axis with the model's interleave/block order."""
    C = w_u.shape[0]
    F = w_u.shape[1] // K
    wu = w_u.reshape(C, F, K)
    w = jnp.einsum("cfk,fn->ckn", wu, w_o).reshape(C, K * w_o.shape[1])
    b = jnp.einsum("fk,fn->kn", b_u.reshape(F, K), w_o)
    if b_o is not None:
        b = b + b_o[None, :]
    return w, b.reshape(-1)

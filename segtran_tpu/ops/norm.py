"""Half-precision-friendly LayerNorm.

flax nn.LayerNorm promotes the whole input to float32 to normalize, which on
big half-precision activations ([B, M, N, F] encoder tensors) makes XLA
materialize full-size f32 intermediates at fusion seams -- pure HBM waste in
bf16 mode (seen in the flagship 2D forward's HLO: several 300 MB-1.2 GB f32
tensors around the encoder's LayerNorm chains).

FastLayerNorm keeps the *statistics* in float32 (one small [..., 1] reduction
per token -- accuracy where it matters) but performs the elementwise
normalize/scale/shift in the input dtype, so every full-size tensor the
fusion touches stays bf16. Param names/shapes match nn.LayerNorm ('scale',
'bias') so checkpoints are interchangeable; in float32 the math is identical
to nn.LayerNorm up to reassociation.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastLayerNorm(nn.Module):
    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        # clamp like flax nn.LayerNorm: E[x^2]-mean^2 can round negative for
        # near-constant rows with a large offset, and rsqrt(<0) is NaN
        var = jnp.maximum(0.0, jnp.mean(jnp.square(x32), axis=-1,
                                        keepdims=True) - jnp.square(mean))
        inv = jax.lax.rsqrt(var + self.epsilon)
        dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
        y = (x.astype(dt) - mean.astype(dt)) * inv.astype(dt)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (f,))
            y = y * scale.astype(dt)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (f,))
            y = y + bias.astype(dt)
        return y.astype(self.dtype)


def layer_norm(dtype, *, epsilon, use_bias=True, use_scale=True, name=None):
    """nn.LayerNorm in float32 (exact reference math), FastLayerNorm in half
    precision (f32 stats, half elementwise). Same param layout either way."""
    if dtype in (jnp.bfloat16, jnp.float16):
        return FastLayerNorm(epsilon=epsilon, use_bias=use_bias,
                             use_scale=use_scale, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=epsilon, use_bias=use_bias,
                        use_scale=use_scale, dtype=dtype, name=name)

"""Generic ViT encoder used by the TransUNet and SETR baselines.

Standard pre-norm transformer (MHSA + MLP) over patch tokens with learned
position embeddings -- the architecture the reference's vendored baselines
use (reference code/networks/transunet/vit_seg_modeling.py:50-257,
code/networks/setr/). Written TPU-first: one fused attention einsum chain,
bf16-capable, static shapes.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MlpBlock(nn.Module):
    mlp_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(d, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout: float = 0.1
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="attention_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.attn_dropout,
            dtype=self.dtype, name="attn")(h, h,
                                           deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_norm")(x)
        h = MlpBlock(self.mlp_dim, self.dropout, self.dtype,
                     name="ffn")(h, deterministic=deterministic)
        return x + h


class ViTEncoder(nn.Module):
    """Tokens [B, N, D] -> encoded tokens; optional per-layer outputs for
    SETR's auxiliary heads."""
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1
    keep_layer_outputs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        outs = []
        for i in range(self.num_layers):
            x = ViTBlock(self.num_heads, self.mlp_dim, self.dropout,
                         dtype=self.dtype,
                         name=f"block_{i}")(x, deterministic=deterministic)
            if self.keep_layer_outputs:
                outs.append(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="encoder_norm")(x)
        if self.keep_layer_outputs:
            return x, outs
        return x


class PatchEmbed(nn.Module):
    """Image/feature map -> patch tokens + learned position embeddings."""
    hidden_dim: int = 768
    patch: int = 16
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        p = self.patch
        x = nn.Conv(self.hidden_dim, (p, p), strides=(p, p),
                    dtype=self.dtype, name="patch_embeddings")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, h * w, self.hidden_dim))
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x, (h, w)

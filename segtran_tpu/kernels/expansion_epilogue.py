"""Fused expansion epilogue: per-mode private output linear + LayerNorm +
learned softmax mode-pooling in ONE pass over the [B, M, N, F] mid tensor.

The reference's ExpandedFeatTrans tail (segtran_shared.py:255-275 private
output, :311-325 LearnedSoftAggregate) is, per mode m:

    y_m   = mid_m @ W2_m + b2_m          (MMPrivateOutput group linear;
                                          the residual is dropped -- the
                                          reference quirk)
    l_m   = LayerNorm(y_m)               (eps 1e-12)
    s_m   = l_m @ w_s + b_s              (feat2score)
    out   = sum_m softmax_m(s) * l_m     (pool over modes)

On the XLA path every step round-trips a [B, M, N, F] tensor through HBM
(y, l), which at the flagship's N-token side (N=1296 x batch, F up to 1792)
is the encoder's dominant bandwidth term. This kernel streams mid tile by
tile and writes only the pooled [B, N, F] result: one read + one 1/M-size
write instead of ~3 round trips.

Constraint: the whole [M, F, F] W2 weight must fit in VMEM alongside the
tiles (it is fetched once -- constant index map -- and stays resident), so
the kernel serves layers with M*F*F*itemsize <= W2_VMEM_BUDGET (the
flagship's compressed layers F=896/448; the F=1792 layer 0 falls back to
XLA). Forward-only (inference/serving path): no custom VJP, the caller must
keep the XLA path for training.

Numerics: MXU accumulation fp32; bias-add / normalize in the compute dtype
with fp32 LN statistics (same recipe as ops/norm.FastLayerNorm); the mode
softmax and the pooling sum run fp32 (slightly more accurate than the XLA
bf16 path).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# [M, F, F] resident-weight budget (bytes). 9 MB leaves room for the mid /
# out tiles + fp32 temporaries in ~16 MB VMEM (tile_n shrinks to 128 at
# F >= 1024, see fused_private_output_pool) and admits the BraTS flagship's
# F=1024 x 4-mode layer (8.4 MB bf16).
W2_VMEM_BUDGET = 9 * 1024 * 1024


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _erf_f32(x):
    """f32 erf as Eigen's generic_fast_erf_float rational minimax (the same
    approximation XLA's f32 erf lowers to): x*alpha(x^2)/beta(x^2) on
    x clamped to [-4, 4]; |error| < 1 f32 ulp of erf over the range. Needed
    because this jaxlib's Mosaic TC lowering implements neither erf nor
    erfc."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = x2 * -2.72614225801306e-10 + 2.77068142495902e-08
    a = a * x2 + -2.10102402082508e-06
    a = a * x2 + -5.69250639462346e-05
    a = a * x2 + -7.34990630326855e-04
    a = a * x2 + -2.95459980854025e-03
    a = a * x2 + -1.60960333262415e-02
    a = a * x
    b = x2 * -1.45660718464996e-05 + -2.13374055278905e-04
    b = b * x2 + -1.68282697438203e-03
    b = b * x2 + -7.37332916720468e-03
    b = b * x2 + -1.42647390514189e-02
    return a / b


def _gelu_erf(x):
    """Exact (erf-form) gelu matching the XLA path's jax.nn.gelu
    (approximate=False) numerics: computed in f32 via _erf_f32 and rounded
    once to the compute dtype -- within 1 bf16 ulp of XLA's erfc chain,
    asserted by the kernel parity tests."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + _erf_f32(x32 * 0.7071067811865476))
    return y.astype(x.dtype)


def supports(num_modes: int, feat_dim: int, itemsize: int) -> bool:
    return num_modes * feat_dim * feat_dim * itemsize <= W2_VMEM_BUDGET


def supports_full(num_modes: int, num_keys: int, feat_dim: int,
                  itemsize: int) -> bool:
    """Gate for fused_mid_output_pool: W2 [M,F,F] plus the per-batch V.W1
    operand [M,A,F] must both sit resident in VMEM. num_keys counts at its
    lane-padded size -- the kernel pads the attractor axis to 128."""
    resident = (num_modes * feat_dim * feat_dim
                + num_modes * _pad128(num_keys) * feat_dim) * itemsize
    return resident <= W2_VMEM_BUDGET


def supports_permode(num_keys: int, feat_dim: int, itemsize: int) -> bool:
    """Gate for fused_mid_output_pool_permode: one mode's W2 [F, F] (plus the
    small lane-padded [A, F] vw1 slice) resident -- admits the flagship's
    F=1792 layer 0 (6.4 MB bf16) that the all-modes kernels cannot hold."""
    resident = (feat_dim * feat_dim + _pad128(num_keys) * feat_dim) * itemsize
    return resident <= W2_VMEM_BUDGET


def _pad_tiles_2d(probs, vw1, f: int, tile_n):
    """Shared preamble of the two full-fusion wrappers: tile_n heuristic and
    N-/A-axis zero padding (both exact). Returns (probs, vw1, tile_n, n_pad,
    a_pad)."""
    n, a = probs.shape[2], probs.shape[3]
    if tile_n is None:
        tile_n = 128 if f >= 768 else 256
    tile_n = min(tile_n, max(128, _pad128(n)))
    n_pad = ((n + tile_n - 1) // tile_n) * tile_n
    if n_pad != n:
        probs = jnp.pad(probs, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    a_pad = _pad128(a)
    if a_pad != a:
        probs = jnp.pad(probs, ((0, 0), (0, 0), (0, 0), (0, a_pad - a)))
        vw1 = jnp.pad(vw1, ((0, 0), (0, 0), (0, a_pad - a), (0, 0)))
    return probs, vw1, tile_n, n_pad, a_pad


def _ln_score_pool(ls, ss, o_ref):
    """Shared tail: softmax over modes (fp32) + weighted sum; ls: per-mode
    [TN, F] (compute dtype), ss: per-mode [TN, 1] fp32 scores."""
    smax = functools.reduce(jnp.maximum, ss)
    es = [jnp.exp(s - smax) for s in ss]
    denom = functools.reduce(jnp.add, es)
    acc = functools.reduce(
        jnp.add, [e * l.astype(jnp.float32) for e, l in zip(es, ls)])
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _out_ln_score(z32, b2_m, scale, lnb, ws, bs, cdt, ln_eps):
    """Shared per-mode tail from the fp32 output-linear accumulator:
    bias-add in cdt, LayerNorm (fp32 stats), feat2score."""
    z = z32.astype(cdt) + b2_m[None, :]
    z32 = z.astype(jnp.float32)
    mean = jnp.mean(z32, axis=-1, keepdims=True)
    # clamped like flax nn.LayerNorm: E[z^2]-mean^2 can round negative for a
    # near-constant row, and rsqrt(<0) is NaN
    var = jnp.maximum(0.0, jnp.mean(jnp.square(z32), axis=-1, keepdims=True)
                      - jnp.square(mean))
    inv = jax.lax.rsqrt(var + ln_eps)
    l = (z - mean.astype(cdt)) * inv.astype(cdt) * scale[None, :] \
        + lnb[None, :]                 # [TN, F] cdt
    s = jax.lax.dot_general(l, ws, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bs
    return l, s


def _epilogue_kernel(mid_ref, w2_ref, b2_ref, scale_ref, lnb_ref, ws_ref,
                     bs_ref, o_ref, *, num_modes: int, ln_eps: float):
    cdt = mid_ref.dtype
    scale = scale_ref[0]               # [F]
    lnb = lnb_ref[0]                   # [F]
    ws = ws_ref[:]                     # [F, 1]
    bs = bs_ref[0, 0]

    ls = []
    ss = []
    for m in range(num_modes):
        x = mid_ref[0, m]              # [TN, F]
        z32 = jax.lax.dot_general(x, w2_ref[m], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l, s = _out_ln_score(z32, b2_ref[m], scale, lnb, ws, bs, cdt, ln_eps)
        ls.append(l)
        ss.append(s)                   # [TN, 1] fp32
    _ln_score_pool(ls, ss, o_ref)


def _mid_epilogue_kernel(p_ref, vw1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                         lnb_ref, ws_ref, bs_ref, o_ref, *, num_modes: int,
                         ln_eps: float):
    """Full fusion: mid_m = gelu(P_m @ (V W1)_m + b1) computed in-kernel, so
    the [B, M, N, F] mid tensor never exists in HBM -- the kernel reads the
    [B, M, N, A] attention probs (A = num_attractors << F) instead."""
    cdt = o_ref.dtype
    scale = scale_ref[0]
    lnb = lnb_ref[0]
    b1 = b1_ref[0]
    ws = ws_ref[:]
    bs = bs_ref[0, 0]

    ls = []
    ss = []
    for m in range(num_modes):
        p = p_ref[0, m].astype(cdt)    # [TN, A]
        mid32 = jax.lax.dot_general(p, vw1_ref[0, m], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        # XLA-path numerics (MMSharedMid): round to compute dtype, bias-add,
        # exact (erf) gelu -- attention.py _gelu_exact.
        mid = _gelu_erf(mid32.astype(cdt) + b1[None, :])
        z32 = jax.lax.dot_general(mid, w2_ref[m], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        l, s = _out_ln_score(z32, b2_ref[m], scale, lnb, ws, bs, cdt, ln_eps)
        ls.append(l)
        ss.append(s)
    _ln_score_pool(ls, ss, o_ref)


def _mode_mid_ln_kernel(p_ref, vw1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                        lnb_ref, ws_ref, bs_ref, l_ref, s_ref, *,
                        ln_eps: float):
    """Single-mode body of the full fusion: emits the LayerNormed output l
    and the feat2score s instead of pooling (the pool over modes runs as one
    fused XLA elementwise pass on the M per-mode outputs)."""
    cdt = l_ref.dtype
    p = p_ref[0].astype(cdt)               # [TN, A]
    mid32 = jax.lax.dot_general(p, vw1_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mid = _gelu_erf(mid32.astype(cdt) + b1_ref[0][None, :])
    z32 = jax.lax.dot_general(mid, w2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    l, s = _out_ln_score(z32, b2_ref[0], scale_ref[0], lnb_ref[0], ws_ref[:],
                         bs_ref[0, 0], cdt, ln_eps)
    l_ref[0] = l
    # [TN, 1] block: Mosaic requires the second-to-minor block dim divisible
    # by 8, so the score rides a trailing size-1 lane axis (like the flash
    # kernel's lse) instead of a 2D [B, N] layout
    s_ref[0] = s


def fused_mid_output_pool_permode(probs: jnp.ndarray, vw1: jnp.ndarray,
                                  b1: jnp.ndarray, w2: jnp.ndarray,
                                  b2: jnp.ndarray, ln_scale: jnp.ndarray,
                                  ln_bias: jnp.ndarray, ws: jnp.ndarray,
                                  bs: jnp.ndarray, *, ln_eps: float = 1e-12,
                                  tile_n: Optional[int] = None,
                                  interpret: Optional[bool] = None
                                  ) -> jnp.ndarray:
    """Large-F tier of the full fusion (same signature/math as
    fused_mid_output_pool): one pallas_call PER MODE, each holding only that
    mode's [F, F] output weight resident (fits F=1792 bf16 in VMEM where the
    all-modes kernel cannot), emitting l_m + s_m; the mode softmax-pool runs
    as one fused XLA elementwise pass. HBM per batch at the flagship layer 0
    (F=1792, bs 64): ~3.1 GB (P + vw1 + l round trip + out) vs ~5-7 GB for
    the XLA chain that materializes mid, y and l."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m, n, _ = probs.shape
    f = vw1.shape[-1]
    dt = vw1.dtype
    probs, vw1, tile_n, n_pad, a_pad = _pad_tiles_2d(probs, vw1, f, tile_n)

    const = lambda *_: (0, 0)
    ls, ss = [], []
    for mi in range(m):
        l_m, s_m = pl.pallas_call(
            functools.partial(_mode_mid_ln_kernel, ln_eps=ln_eps),
            grid=(b, n_pad // tile_n),
            in_specs=[
                pl.BlockSpec((1, tile_n, a_pad), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, a_pad, f), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, f), const),
                pl.BlockSpec((f, f), const),
                pl.BlockSpec((1, f), const),
                pl.BlockSpec((1, f), const),
                pl.BlockSpec((1, f), const),
                pl.BlockSpec((f, 1), const),
                pl.BlockSpec((1, 1), const),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n, f), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, tile_n, 1), lambda i, j: (i, j, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((b, n_pad, f), dt),
                       jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(probs[:, mi], vw1[:, mi], b1.astype(dt)[None], w2[mi].astype(dt),
          b2[mi].astype(dt)[None], ln_scale.astype(dt)[None],
          ln_bias.astype(dt)[None], ws.astype(dt),
          bs.astype(jnp.float32)[None])
        ls.append(l_m[:, :n])
        ss.append(s_m[:, :n, 0])
    # softmax pool over modes, fp32 (one fused XLA elementwise pass)
    smax = functools.reduce(jnp.maximum, ss)
    es = [jnp.exp(s - smax)[..., None] for s in ss]
    denom = functools.reduce(jnp.add, es)
    acc = functools.reduce(
        jnp.add, [e * l.astype(jnp.float32) for e, l in zip(es, ls)])
    return (acc / denom).astype(dt)


def fused_private_output_pool(mid: jnp.ndarray, w2: jnp.ndarray,
                              b2: jnp.ndarray, ln_scale: jnp.ndarray,
                              ln_bias: jnp.ndarray, ws: jnp.ndarray,
                              bs: jnp.ndarray, *, ln_eps: float = 1e-12,
                              tile_n: Optional[int] = None,
                              interpret: Optional[bool] = None
                              ) -> jnp.ndarray:
    """mid: [B, M, N, F]; w2: [M, F, F]; b2: [M, F]; ln_scale/ln_bias: [F];
    ws: [F, 1]; bs: [1]. Returns the pooled [B, N, F] in mid.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m, n, f = mid.shape
    dt = mid.dtype
    if tile_n is None:
        tile_n = 128 if f >= 1024 else 256
    tile_n = min(tile_n, max(128, ((n + 127) // 128) * 128))
    n_pad = ((n + tile_n - 1) // tile_n) * tile_n
    if n_pad != n:
        mid = jnp.pad(mid, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, num_modes=m, ln_eps=ln_eps),
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, m, tile_n, f), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((m, f, f), const3),
            pl.BlockSpec((m, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((f, 1), const),
            pl.BlockSpec((1, 1), const),
        ],
        out_specs=pl.BlockSpec((1, tile_n, f), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, f), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(mid, w2.astype(dt), b2.astype(dt), ln_scale.astype(dt)[None],
      ln_bias.astype(dt)[None], ws.astype(dt), bs.astype(jnp.float32)[None])
    return out[:, :n]


def fused_mid_output_pool(probs: jnp.ndarray, vw1: jnp.ndarray,
                          b1: jnp.ndarray, w2: jnp.ndarray,
                          b2: jnp.ndarray, ln_scale: jnp.ndarray,
                          ln_bias: jnp.ndarray, ws: jnp.ndarray,
                          bs: jnp.ndarray, *, ln_eps: float = 1e-12,
                          tile_n: Optional[int] = None,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Full fusion of the attractor-out expansion tail: probs [B, M, N, A],
    vw1 = (V W1) [B, M, A, F] (shared-mid premul, attention.py
    apply_mid_premul), b1 [F] (shared-mid bias); remaining args as
    fused_private_output_pool. Computes mid = gelu(probs @ vw1 + b1) per tile
    in VMEM, so HBM sees only one probs read + one pooled write -- at the
    flagship's F=896 layer that is ~3.5x less epilogue read traffic than
    streaming the mid tensor, on top of skipping the mid write entirely."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m, n, _ = probs.shape
    f = vw1.shape[-1]
    dt = vw1.dtype
    probs, vw1, tile_n, n_pad, a_pad = _pad_tiles_2d(probs, vw1, f, tile_n)

    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_mid_epilogue_kernel, num_modes=m, ln_eps=ln_eps),
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, m, tile_n, a_pad), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, m, a_pad, f), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((m, f, f), const3),
            pl.BlockSpec((m, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((f, 1), const),
            pl.BlockSpec((1, 1), const),
        ],
        out_specs=pl.BlockSpec((1, tile_n, f), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, f), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(probs, vw1, b1.astype(dt)[None], w2.astype(dt), b2.astype(dt),
      ln_scale.astype(dt)[None], ln_bias.astype(dt)[None], ws.astype(dt),
      bs.astype(jnp.float32)[None])
    return out[:, :n]

"""EfficientNet-B0..B7 feature extractor in flax (channels-last, NHWC).

Built from the EfficientNet paper's architecture to mirror the behavior of the
reference's vendored implementation (reference code/efficientnet/model.py,
utils.py) closely enough for exact weight conversion:

  * round_filters / round_repeats width & depth scaling (utils.py:82-127),
  * MBConv: expand -> depthwise -> SE (squeeze channels from *input* filters,
    model.py:71) -> project, swish activations, id-skip + drop-connect,
  * BatchNorm eps 1e-3, momentum 0.99 (TF convention),
  * endpoints = last activation of segments 0,1,2,4 plus the head conv output
    ("reduction_1..5", model.py:184-214, 240-284),
  * ``stem_stride`` 1|2: stride-1 stem doubles every feature map
    (bb_feat_upsize, model.py:174-176),
  * **static SAME padding**: the reference precomputes TF-SAME pads from the
    *variant's nominal image size* (e.g. 380 for b4), not the runtime size
    (utils.py:248-276), and the nominal size chain divides by 2 after the stem
    regardless of stem_stride (model.py:178). Released checkpoints were trained
    with those pads, so we replicate the same static chain. Set
    ``padding_mode='same'`` for true TF-SAME (computed from runtime size).

Module names mirror the torch attribute names (_conv_stem, _blocks.{i},
_expand_conv, ...) so the generic state_dict converter maps weights with no
special cases.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# name: (width_coefficient, depth_coefficient, nominal_resolution, dropout)
EFFICIENTNET_PARAMS = {
    # eff-tiny is ours (no reference counterpart): the minimal legal scaling
    # of the B0 block table (1 repeat per segment, narrowest widths) used by
    # the multi-chip dryrun and compile-latency-sensitive tests, where the
    # 1-core CPU host cannot afford compiling 16 MBConv blocks.
    "eff-tiny": (0.35, 0.1, 64, 0.2),
    "eff-b0": (1.0, 1.0, 224, 0.2),
    "eff-b1": (1.0, 1.1, 240, 0.2),
    "eff-b2": (1.1, 1.2, 260, 0.3),
    "eff-b3": (1.2, 1.4, 300, 0.3),
    "eff-b4": (1.4, 1.8, 380, 0.4),
    "eff-b5": (1.6, 2.2, 456, 0.4),
    "eff-b6": (1.8, 2.6, 528, 0.5),
    "eff-b7": (2.0, 3.1, 600, 0.5),
}

# B0 block args: (num_repeat, kernel, stride, expand_ratio, in_filters,
# out_filters, se_ratio) -- reference utils.py:512-520.
_B0_BLOCKS = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)
_ENDPOINT_SEGMENTS = (0, 1, 2, 4)  # reference model.py:184


def round_filters(filters: int, width_coefficient: float,
                  divisor: int = 8) -> int:
    """Reference utils.py:82-108."""
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def _static_same_pad(image_size: Tuple[int, int], kernel: int,
                     stride: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """TF-SAME zero-pad computed from a nominal size (utils.py:255-271).
    Returns ((top, bottom), (left, right))."""
    ih, iw = image_size
    oh, ow = math.ceil(ih / stride), math.ceil(iw / stride)
    pad_h = max((oh - 1) * stride + kernel - ih, 0)
    pad_w = max((ow - 1) * stride + kernel - iw, 0)
    return ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2))


def _ceil_div_size(size: Tuple[int, int], stride: int) -> Tuple[int, int]:
    return (int(math.ceil(size[0] / stride)), int(math.ceil(size[1] / stride)))


@dataclass(frozen=True)
class _BlockSpec:
    kernel: int
    stride: int
    expand_ratio: int
    in_filters: int
    out_filters: int
    se_ratio: float
    pad: Tuple[Tuple[int, int], Tuple[int, int]]  # depthwise conv pad


def build_block_specs(variant: str, stem_stride: int = 2,
                      padding_mode: str = "static_same",
                      ) -> Tuple[Tuple[_BlockSpec, ...], Tuple[int, ...], int, int,
                                 Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Expand B0 args by the variant's width/depth and precompute static pads.
    Returns (blocks, endpoint_block_indices, stem_filters, head_filters,
    stem_pad)."""
    w, d, res, _ = EFFICIENTNET_PARAMS[variant]
    size = (res, res)
    stem_filters = round_filters(32, w)
    stem_pad = (_static_same_pad(size, 3, stem_stride)
                if padding_mode == "static_same" else None)
    # Nominal size divides by 2 after the stem regardless of stem_stride
    # (reference model.py:178).
    size = _ceil_div_size(size, 2)
    blocks: List[_BlockSpec] = []
    endpoint_blk_indices = []
    for seg_i, (r, k, s, e, ci, co, se) in enumerate(_B0_BLOCKS):
        ci_r, co_r = round_filters(ci, w), round_filters(co, w)
        r_r = round_repeats(r, d)
        for j in range(r_r):
            stride = s if j == 0 else 1
            in_f = ci_r if j == 0 else co_r
            pad = (_static_same_pad(size, k, stride)
                   if padding_mode == "static_same" else None)
            blocks.append(_BlockSpec(k, stride, e, in_f, co_r, se, pad))
            if j == 0:
                size = _ceil_div_size(size, stride)
        if seg_i in _ENDPOINT_SEGMENTS:
            endpoint_blk_indices.append(len(blocks))
    head_filters = round_filters(1280, w)
    return (tuple(blocks), tuple(endpoint_blk_indices), stem_filters,
            head_filters, stem_pad)


class FoldedBatchNorm(nn.Module):
    """BatchNorm with the normalize reassociated into one per-channel affine:
    ``y = x * a + b`` with ``a = scale * rsqrt(var + eps)`` and
    ``b = bias - mean * a`` computed in f32 on [C]-vectors, the big [B,H,W,C]
    multiply-add applied in the compute ``dtype``.

    Same math as flax ``nn.BatchNorm`` (exact reassociation; stats reductions
    and running-average updates stay f32) and the identical param/batch_stats
    tree (scale/bias, mean/var), so checkpoints and the torch converter are
    unaffected. Motivation (round-4 train-step profiling): flax's
    ``_normalize`` promotes the whole elementwise chain to f32
    (force_float32_reductions), so under bf16 training every BN in the
    backbone materializes f32 [B,H,W,C] intermediates at fusion boundaries
    that the backward must stream from HBM; the folded bf16 affine halves
    that traffic and drops the convert round-trips.

    TF eps 1e-3 / momentum 0.99 like the reference backbone (reference
    code/efficientnet/model.py:112-118); axis_name syncs batch stats across
    data-parallel devices (replaces torch SyncBatchNorm, train2d.py:1109)."""
    use_running_average: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            # biased variance, no clamp -- matches flax _compute_stats
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * a.astype(self.dtype) + b.astype(self.dtype)


def _BN(use_running_average=True, axis_name=None, dtype=jnp.float32,
        name=None):
    """BatchNorm with TF eps/momentum; optional cross-replica sync via
    axis_name. Plain constructor (not a wrapper module) so the param path
    matches the torch attribute name exactly. Folded-affine implementation
    (FoldedBatchNorm) -- same tree/math as nn.BatchNorm, bf16-friendly."""
    return FoldedBatchNorm(use_running_average=use_running_average,
                           axis_name=axis_name, dtype=dtype, name=name)


def _drop_connect(x, rate, deterministic, rng):
    """Per-sample stochastic depth (reference utils.py:129-154). rate may be
    a traced scalar (scan mode): rate=0 then degenerates to bernoulli(1)."""
    if deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    # keep cast to x.dtype: a traced f32 rate must not promote a bf16
    # carry (the scan body requires carry-in/carry-out dtypes to match)
    return x / jnp.asarray(keep, x.dtype) * mask


class _ConvKernel(nn.Module):
    """Parameter-fetch twin of nn.Conv: creates/reads the identical
    ``kernel`` leaf (same name, shape, init) without running the conv --
    the fused-eval path feeds the raw weights to the Pallas kernel."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNFold(nn.Module):
    """Parameter-fetch twin of nn.BatchNorm (same scale/bias params and
    batch_stats mean/var), returned as the folded eval-mode affine."""
    feats: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.feats,))
        bias = self.param("bias", nn.initializers.zeros, (self.feats,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.feats,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.feats,), jnp.float32))
        from ...kernels.mbconv import fold_bn
        return fold_bn(scale.astype(jnp.float32),
                       bias.astype(jnp.float32),
                       mean.value.astype(jnp.float32),
                       var.value.astype(jnp.float32), self.eps)


class MBConvBlock(nn.Module):
    spec: _BlockSpec
    drop_rate: float
    bn_axis_name: Optional[str] = None
    # eval-only Pallas fusion of expand+BN+swish+depthwise+BN+swish
    # (kernels/mbconv.py); training keeps the XLA path (+its backward)
    fused_eval: bool = False
    # shifted-slice stencil depthwise instead of the grouped-conv primitive
    # (ops/depthwise.py) -- same math/params, avoids XLA's materialization-
    # heavy depthwise backward lowering
    dw_stencil: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, drop_rate=None):
        """drop_rate (optional, possibly traced) overrides the static
        attribute -- used by the scan-over-blocks path where the per-block
        stochastic-depth rate is a scanned input."""
        s = self.spec
        inputs = x
        expanded = s.in_filters * s.expand_ratio
        conv = lambda feats, k, stride, name, groups=1, pad="VALID": nn.Conv(
            feats, (k, k), strides=(stride, stride), padding=pad,
            feature_group_count=groups, use_bias=False, dtype=self.dtype,
            name=name)
        if (self.fused_eval and not train and s.stride == 1
                and s.expand_ratio != 1 and 36 <= x.shape[1] <= 144):
            # The Pallas fusion pays off where the 6x-expanded tensor is
            # large relative to compute: measured per-block on the v5e,
            # expand blocks at 144^2..36^2 win (1.5-1.9x), while e1 blocks
            # (no expanded tensor to save) and 18^2 blocks (grid-step
            # overhead) favor XLA, as do stride-2 blocks (Mosaic has no
            # strided vector slice).
            return self._fused_eval_call(x, conv)
        if s.expand_ratio != 1:
            x = conv(expanded, 1, 1, "_expand_conv")(x)
            x = _BN(not train, self.bn_axis_name, self.dtype, name="_bn0")(x)
            x = nn.silu(x)
        if self.dw_stencil:
            from ...ops.depthwise import depthwise_conv2d_stencil
            wk = _ConvKernel((s.kernel, s.kernel, 1, expanded),
                             name="_depthwise_conv")()
            dwpad = (s.pad if s.pad is not None else
                     _static_same_pad(x.shape[1:3], s.kernel, s.stride))
            x = depthwise_conv2d_stencil(x, wk.astype(self.dtype),
                                         (s.stride, s.stride), dwpad)
        else:
            pad = s.pad if s.pad is not None else "SAME"
            x = conv(expanded, s.kernel, s.stride, "_depthwise_conv",
                     groups=expanded, pad=pad)(x)
        x = _BN(not train, self.bn_axis_name, self.dtype, name="_bn1")(x)
        x = nn.silu(x)
        if s.se_ratio and 0 < s.se_ratio <= 1:
            # squeeze channels computed from *input* filters (model.py:71)
            nsq = max(1, int(s.in_filters * s.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(nsq, (1, 1), use_bias=True, dtype=self.dtype,
                         name="_se_reduce")(se)
            se = nn.silu(se)
            se = nn.Conv(expanded, (1, 1), use_bias=True, dtype=self.dtype,
                         name="_se_expand")(se)
            x = jax.nn.sigmoid(se) * x
        x = conv(s.out_filters, 1, 1, "_project_conv")(x)
        x = _BN(not train, self.bn_axis_name, self.dtype, name="_bn2")(x)
        if s.stride == 1 and s.in_filters == s.out_filters:
            rate = self.drop_rate if drop_rate is None else drop_rate
            static_zero = isinstance(rate, float) and rate == 0.0
            if train and not static_zero:
                rng = self.make_rng("dropout")
                x = _drop_connect(x, rate, not train, rng)
            x = x + inputs
        return x

    def _fused_eval_call(self, x, conv):
        """Eval-mode forward through the Pallas-fused front half
        (kernels/mbconv.py): the expanded tensor stays in VMEM and the SE
        pool comes out of the kernel's partial sums; SE-scale + project +
        BN + residual stay in XLA, which serves them from one read of the
        depthwise output. Params are the exact same leaves as the unfused
        path (_ConvKernel/_BNFold are name/shape/init twins)."""
        from ...kernels.mbconv import mbconv_front
        s = self.spec
        inputs = x
        expanded = s.in_filters * s.expand_ratio
        w_exp = s0 = b0 = None
        if s.expand_ratio != 1:
            wk = _ConvKernel((1, 1, s.in_filters, expanded),
                             name="_expand_conv")()
            w_exp = wk.reshape(s.in_filters, expanded).astype(self.dtype)
            s0, b0 = _BNFold(expanded, name="_bn0")()
        w_dw = _ConvKernel((s.kernel, s.kernel, 1, expanded),
                           name="_depthwise_conv")()
        w_dw = w_dw.reshape(s.kernel, s.kernel, expanded).astype(self.dtype)
        s1, b1 = _BNFold(expanded, name="_bn1")()
        pad = (s.pad if s.pad is not None else
               _static_same_pad(x.shape[1:3], s.kernel, s.stride))
        dw, se_mean = mbconv_front(
            x.astype(self.dtype), w_exp, s0, b0, w_dw, s1, b1,
            kernel=s.kernel, stride=s.stride, pad=pad)
        if s.se_ratio and 0 < s.se_ratio <= 1:
            nsq = max(1, int(s.in_filters * s.se_ratio))
            se = se_mean[:, None, None, :].astype(self.dtype)
            se = nn.Conv(nsq, (1, 1), use_bias=True, dtype=self.dtype,
                         name="_se_reduce")(se)
            se = nn.silu(se)
            se = nn.Conv(expanded, (1, 1), use_bias=True, dtype=self.dtype,
                         name="_se_expand")(se)
            dw = jax.nn.sigmoid(se) * dw
        y = conv(s.out_filters, 1, 1, "_project_conv")(dw)
        y = _BN(True, self.bn_axis_name, self.dtype, name="_bn2")(y)
        if s.stride == 1 and s.in_filters == s.out_filters:
            y = y + inputs
        return y


class _MBConvScanBody(nn.Module):
    """nn.scan body: one within-segment repeat. All repeats after a
    segment's first block share (stride=1, in=out filters, pad), so their
    params stack along a leading axis and XLA compiles ONE block body per
    segment instead of one per repeat -- the HLO (and the multi-minute
    remote-compile time it drives) shrinks by ~the segment repeat count."""
    spec: _BlockSpec
    train: bool
    bn_axis_name: Optional[str] = None
    fused_eval: bool = False
    remat_blocks: bool = False
    dw_stencil: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rate):
        cls = (nn.remat(MBConvBlock, static_argnums=(2,))
               if self.remat_blocks else MBConvBlock)
        # positional (x, train, drop_rate) so static_argnums lines up
        y = cls(self.spec, 0.0, self.bn_axis_name, self.fused_eval,
                dw_stencil=self.dw_stencil, dtype=self.dtype,
                name="block")(x, self.train, rate)
        return y, None


def segment_layout(variant: str) -> Tuple[Tuple[int, int], ...]:
    """Per-segment (first_global_block_index, num_repeats) after depth
    scaling -- the grouping used by the scan path and the (un)stack shims."""
    _, d, _, _ = EFFICIENTNET_PARAMS[variant]
    out = []
    i = 0
    for (r, *_rest) in _B0_BLOCKS:
        rr = round_repeats(r, d)
        out.append((i, rr))
        i += rr
    return tuple(out)


def _tree_map_stack(trees):
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)


def stack_mbconv_params(backbone_tree: dict, variant: str) -> dict:
    """Per-block checkpoint layout (`_blocks_{i}`) -> scan layout
    (`_blocks_{first}` + `_blocks_scan_{seg}/block` with stacked leaves).
    Works on params and batch_stats trees alike; non-block keys pass
    through. Inverse: unstack_mbconv_params."""
    out = {k: v for k, v in backbone_tree.items()
           if not k.startswith("_blocks_")}
    for seg, (i0, rr) in enumerate(segment_layout(variant)):
        out[f"_blocks_{i0}"] = backbone_tree[f"_blocks_{i0}"]
        if rr > 1:
            out[f"_blocks_scan_{seg}"] = {"block": _tree_map_stack(
                [backbone_tree[f"_blocks_{i0 + j}"] for j in range(1, rr)])}
    return out


def maybe_adapt_scan_layout(tree, variant: str, want_scan: bool):
    """Recursively adapt a loaded params/batch_stats tree to the model's
    block layout: any subtree that looks like an EfficientNet backbone
    (contains `_conv_stem`) is (un)stacked to match ``want_scan``. Called by
    the CLIs on checkpoint load so per-block checkpoints (incl. converted
    torch .pth) run under --scanblocks and vice versa."""
    if not isinstance(tree, dict) or variant not in EFFICIENTNET_PARAMS:
        return tree
    # an EfficientNet backbone subtree in either collection: params carry
    # _conv_stem, batch_stats only the _bn*/_blocks_* BN entries
    if any(k.startswith("_blocks_") for k in tree):
        has_scan = any(k.startswith("_blocks_scan_") for k in tree)
        if want_scan and not has_scan:
            return stack_mbconv_params(tree, variant)
        if not want_scan and has_scan:
            return unstack_mbconv_params(tree, variant)
        return tree
    return {k: maybe_adapt_scan_layout(v, variant, want_scan)
            for k, v in tree.items()}


def unstack_mbconv_params(backbone_tree: dict, variant: str) -> dict:
    """Scan layout -> canonical per-block layout (for saving checkpoints
    that non-scan models and the torch exporter understand)."""
    out = {k: v for k, v in backbone_tree.items()
           if not (k.startswith("_blocks_"))}
    for seg, (i0, rr) in enumerate(segment_layout(variant)):
        out[f"_blocks_{i0}"] = backbone_tree[f"_blocks_{i0}"]
        if rr > 1:
            stacked = backbone_tree[f"_blocks_scan_{seg}"]["block"]
            for j in range(1, rr):
                out[f"_blocks_{i0 + j}"] = jax.tree_util.tree_map(
                    lambda l, j=j: l[j - 1], stacked)
    return out


class EfficientNetFeatures(nn.Module):
    """EfficientNet backbone producing the 5-level pyramid used by Segtran
    (reference model.py extract_endpoints)."""
    variant: str = "eff-b4"
    stem_stride: int = 2
    in_channels: int = 3
    padding_mode: str = "static_same"     # static_same (ckpt-parity) | same
    drop_connect_rate: float = 0.2
    # lax.scan over each segment's identical repeats (stacked params): same
    # numerics (exactly, in eval; per-block drop-connect rngs differ in
    # train), much smaller HLO -> faster first compile. Param layout changes
    # (_blocks_scan_{seg}); use stack_mbconv_params/unstack_mbconv_params to
    # move checkpoints between layouts.
    scan_blocks: bool = False
    bn_axis_name: Optional[str] = None
    # eval-only Pallas MBConv fusion (kernels/mbconv.py); no effect on the
    # param tree or the training path
    fused_eval: bool = False
    # per-block jax.checkpoint: backward recomputes each block's BN/silu/SE
    # internals from the block input instead of round-tripping them through
    # HBM (see Segtran2dConfig.remat_blocks for the profiling rationale)
    remat_blocks: bool = False
    # shifted-slice stencil depthwise convs (ops/depthwise.py): same math
    # and params, avoids XLA's materialization-heavy depthwise bwd lowering
    dw_stencil: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        """x: [B, H, W, C] -> 5 endpoints at strides (1,2,4,8,16)/stem_stride."""
        blocks, ep_idx, stem_f, head_f, stem_pad = build_block_specs(
            self.variant, self.stem_stride, self.padding_mode)
        pad = stem_pad if stem_pad is not None else "SAME"
        x = nn.Conv(stem_f, (3, 3), strides=(self.stem_stride,) * 2,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="_conv_stem")(x)
        x = _BN(not train, self.bn_axis_name, self.dtype, name="_bn0")(x)
        x = nn.silu(x)
        endpoints = []
        n = len(blocks)
        blk_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                   if self.remat_blocks else MBConvBlock)
        if self.scan_blocks:
            for seg, (i0, rr) in enumerate(segment_layout(self.variant)):
                rate0 = self.drop_connect_rate * float(i0) / n
                x = blk_cls(blocks[i0], rate0, self.bn_axis_name,
                            self.fused_eval, dw_stencil=self.dw_stencil,
                            dtype=self.dtype,
                            name=f"_blocks_{i0}")(x, train)
                if rr > 1:
                    rates = jnp.asarray(
                        [self.drop_connect_rate * float(i0 + j) / n
                         for j in range(1, rr)], jnp.float32)
                    scan = nn.scan(
                        _MBConvScanBody,
                        variable_axes={"params": 0, "batch_stats": 0},
                        split_rngs={"params": True, "dropout": True},
                        in_axes=0, length=rr - 1)
                    x, _ = scan(blocks[i0 + 1], train, self.bn_axis_name,
                                self.fused_eval, self.remat_blocks,
                                self.dw_stencil, self.dtype,
                                name=f"_blocks_scan_{seg}")(x, rates)
                if (i0 + rr) in ep_idx:
                    endpoints.append(x)
        else:
            for i, spec in enumerate(blocks):
                rate = self.drop_connect_rate * float(i) / n
                x = blk_cls(spec, rate, self.bn_axis_name,
                            self.fused_eval, dw_stencil=self.dw_stencil,
                            dtype=self.dtype,
                            name=f"_blocks_{i}")(x, train)
                if (i + 1) in ep_idx:
                    # endpoint is the input of the next segment's first
                    # block, i.e. this block's output -- reference captures
                    # prev_x at idx in endpoint_blk_indices
                    # (model.py:270-273).
                    endpoints.append(x)
        x = nn.Conv(head_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="_conv_head")(x)
        x = _BN(not train, self.bn_axis_name, self.dtype, name="_bn1")(x)
        x = nn.silu(x)
        endpoints.append(x)
        return tuple(endpoints)

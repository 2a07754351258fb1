"""Torch-compat ops: resize (align_corners=False), pooling, losses."""
import numpy as np
import pytest

import jax.numpy as jnp

from segtran_tpu.ops.resize import resize_linear, avg_pool_nhwc, max_pool_nhwc
from segtran_tpu.ops.losses import (dice_loss_indiv, dice_loss_mix,
                                    weighted_bce_with_logits, calc_vcdr_batch)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((18, 18), (36, 36)),    # upsample x2 (FPN)
    ((36, 36), (18, 18)),    # downsample x2
    ((9, 9), (36, 36)),      # upsample x4
    ((36, 36), (112, 112)),  # logits -> input size (non-integer factor)
    ((7, 11), (19, 5)),      # odd sizes both directions
])
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, *in_hw).astype(np.float32)
    y_t = F.interpolate(torch.tensor(x), size=out_hw, mode="bilinear",
                        align_corners=False).numpy()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    y = np.asarray(resize_linear(x_nhwc, out_hw)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_s,out_s", [
    ((8, 8, 6), (16, 16, 12)),
    ((14, 14, 12), (7, 7, 6)),
    ((5, 7, 3), (9, 4, 8)),
])
def test_trilinear_matches_torch(in_s, out_s):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, *in_s).astype(np.float32)
    y_t = F.interpolate(torch.tensor(x), size=out_s, mode="trilinear",
                        align_corners=False).numpy()
    x_cl = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    y = np.asarray(resize_linear(x_cl, out_s)).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-5)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    y_t = F.avg_pool2d(torch.tensor(x), 8).numpy()
    y = np.asarray(avg_pool_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 (8, 8))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 17, 17).astype(np.float32)
    y_t = F.max_pool2d(torch.tensor(x), 3, stride=2, padding=1).numpy()
    y = np.asarray(max_pool_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-6)


def test_dice_losses_match_reference_formulas():
    rng = np.random.RandomState(4)
    score = rng.rand(4, 1, 16, 16).astype(np.float32)
    gt = (rng.rand(4, 1, 16, 16) > 0.5).astype(np.float32)
    s, g = torch.tensor(score), torch.tensor(gt)
    # reference dice_loss_indiv (utils/losses.py:47-60)
    sv, gv = s.view(4, -1), g.view(4, -1)
    inter = (sv * gv).sum(1)
    dice = (2 * inter + 1e-5) / ((sv * sv).sum(1) + (gv * gv).sum(1) + 1e-5)
    ref_indiv = (1 - dice).mean().item()
    got = float(dice_loss_indiv(jnp.asarray(score), jnp.asarray(gt)))
    assert abs(got - ref_indiv) < 1e-6
    # reference dice_loss_mix (utils/losses.py:63-71)
    ref_mix = (1 - (2 * (s * g).sum() + 1e-5) / (s.sum() + g.sum() + 1e-5)).item()
    got_mix = float(dice_loss_mix(jnp.asarray(score), jnp.asarray(gt)))
    assert abs(got_mix - ref_mix) < 1e-6


def test_bce_matches_torch():
    rng = np.random.RandomState(5)
    logits = rng.randn(2, 3, 8, 8).astype(np.float32) * 3
    targets = (rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
    pw = np.array([1.0, 2.0, 3.0], dtype=np.float32).reshape(1, 3, 1, 1)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets),
        pos_weight=torch.tensor(pw)).item()
    got = float(weighted_bce_with_logits(jnp.asarray(logits),
                                         jnp.asarray(targets),
                                         jnp.asarray(pw)))
    assert abs(got - ref) < 1e-6
    ref0 = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)).item()
    got0 = float(weighted_bce_with_logits(jnp.asarray(logits),
                                          jnp.asarray(targets)))
    assert abs(got0 - ref0) < 1e-6


def test_vcdr():
    mask = np.zeros((2, 20, 20, 3), np.float32)
    mask[0, 4:16, 5:15, 1] = 1.0   # disc rows 4..15 -> len 11 (1-based idx)
    mask[0, 8:12, 8:12, 2] = 1.0   # cup rows 8..11 -> len 3
    mask[1, 2:18, :, 1] = 1.0
    mask[1, 5:10, :, 2] = 1.0
    v = np.asarray(calc_vcdr_batch(jnp.asarray(mask)))
    # Reference batched branch (utils/losses.py:85-95): min over the 0-filled
    # indexed rows is 0 whenever any row is unoccupied, so the "extent" is the
    # max 1-based occupied index. Disc rows 4..15 -> 16; cup rows 8..11 -> 12.
    np.testing.assert_allclose(v[0], 12.0 / (16 + 1e-4), rtol=1e-4)
    np.testing.assert_allclose(v[1], 10.0 / (18 + 1e-4), rtol=1e-4)


@pytest.mark.parametrize("k,s,pad", [
    (3, 1, ((1, 1), (1, 1))),
    (5, 2, ((1, 2), (2, 1))),   # asymmetric TF-SAME-style pad
    (3, 2, ((0, 1), (0, 1))),
])
def test_depthwise_stencil_matches_grouped_conv(k, s, pad):
    """ops/depthwise.py shifted-slice stencil == flax grouped conv, forward
    and gradient (the round-4 backward-HBM lowering fix; same param layout)."""
    import jax
    from flax import linen as nn
    from segtran_tpu.ops.depthwise import depthwise_conv2d_stencil

    rs = np.random.RandomState(0)
    c = 8
    x = jnp.asarray(rs.rand(2, 17, 19, c), jnp.float32)
    w = jnp.asarray(rs.rand(k, k, 1, c), jnp.float32)
    conv = nn.Conv(c, (k, k), strides=(s, s), padding=pad,
                   feature_group_count=c, use_bias=False)
    y_conv = conv.apply({"params": {"kernel": w}}, x)
    y_st = depthwise_conv2d_stencil(x, w, (s, s), pad)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-5)

    gw_conv = jax.grad(lambda w_: jnp.sum(
        conv.apply({"params": {"kernel": w_}}, x) ** 2))(w)
    gw_st = jax.grad(lambda w_: jnp.sum(
        depthwise_conv2d_stencil(x, w_, (s, s), pad) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gw_st), np.asarray(gw_conv),
                               rtol=1e-4, atol=1e-4)
    gx_conv = jax.grad(lambda x_: jnp.sum(
        conv.apply({"params": {"kernel": w}}, x_) ** 2))(x)
    gx_st = jax.grad(lambda x_: jnp.sum(
        depthwise_conv2d_stencil(x_, w, (s, s), pad) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_st), np.asarray(gx_conv),
                               rtol=1e-4, atol=1e-4)

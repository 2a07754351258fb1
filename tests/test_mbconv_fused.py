"""Pallas-fused MBConv front half (kernels/mbconv.py) vs the XLA path.

Interpret-mode on CPU; the kernel itself is exact in fp32 (same pad/stride
semantics as the static-SAME chain), and the whole-backbone fused_eval path
must match the unfused EfficientNetFeatures eval forward with the SAME param
tree (the _ConvKernel/_BNFold param-fetch twins)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtran_tpu.kernels.mbconv import mbconv_front


@pytest.mark.parametrize("k,stride,expand", [
    (3, 1, True), (3, 2, True), (5, 1, True), (5, 2, True), (3, 1, False),
])
def test_mbconv_front_vs_xla(k, stride, expand):
    rng = np.random.RandomState(k * 10 + stride)
    B, H, W, Cin = 2, 12, 20, 8
    Cexp = Cin * (6 if expand else 1)
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w_dw = jnp.asarray(rng.randn(k, k, Cexp) * 0.2, jnp.float32)
    s1 = jnp.asarray(rng.rand(Cexp) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(Cexp) * 0.1, jnp.float32)
    pad_h = max((-(H // -stride) - 1) * stride + k - H, 0)
    pad_w = max((-(W // -stride) - 1) * stride + k - W, 0)
    pad = ((pad_h // 2, pad_h - pad_h // 2),
           (pad_w // 2, pad_w - pad_w // 2))

    if expand:
        w_exp = jnp.asarray(rng.randn(Cin, Cexp) * 0.2, jnp.float32)
        s0 = jnp.asarray(rng.rand(Cexp) + 0.5, jnp.float32)
        b0 = jnp.asarray(rng.randn(Cexp) * 0.1, jnp.float32)
    else:
        w_exp = s0 = b0 = None

    dw, se = mbconv_front(x, w_exp, s0, b0, w_dw, s1, b1,
                          kernel=k, stride=stride, pad=pad)

    # reference semantics: expand on the raw input, pad AFTER (the
    # depthwise conv's zero pad), exactly like the unfused module chain
    if expand:
        e = jnp.einsum("bhwc,cd->bhwd", x, w_exp) * s0 + b0
        e = e * jax.nn.sigmoid(e)
        e = jnp.pad(e, ((0, 0), pad[0], pad[1], (0, 0)))
    else:
        e = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    ref = jax.lax.conv_general_dilated(
        e, w_dw[:, :, None, :], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Cexp)
    ref = ref * s1 + b1
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(se),
                               np.asarray(ref.mean(axis=(1, 2))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_backbone_fused_eval_matches_unfused(scan_blocks):
    """Same init tree drives both paths; endpoints must agree (fp32:
    folded-BN vs BatchNorm reassociation noise only)."""
    from segtran_tpu.nn.backbones.efficientnet import EfficientNetFeatures

    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    base = EfficientNetFeatures(variant="eff-b0", stem_stride=2,
                                scan_blocks=scan_blocks)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, False)
    # make BN stats non-trivial so folding is actually exercised
    variables = jax.tree_util.tree_map(
        lambda l: l + 0.05 if l.ndim == 1 else l, variables)
    ref = base.apply(variables, x, False)

    fused = EfficientNetFeatures(variant="eff-b0", stem_stride=2,
                                 scan_blocks=scan_blocks, fused_eval=True)
    out = fused.apply(variables, x, False)
    assert len(out) == len(ref) == 5
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_fused_eval_init_tree_identical():
    """Init through the fused path must create the exact same tree as the
    unfused path (names, shapes, dtypes) -- checkpoints are interchangeable."""
    from segtran_tpu.nn.backbones.efficientnet import EfficientNetFeatures

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_ref = EfficientNetFeatures(variant="eff-b0").init(
        {"params": jax.random.PRNGKey(0)}, x, False)
    v_fused = EfficientNetFeatures(variant="eff-b0", fused_eval=True).init(
        {"params": jax.random.PRNGKey(0)}, x, False)
    ref_paths = {tuple(str(k) for k in p): (l.shape, l.dtype) for p, l in
                 jax.tree_util.tree_flatten_with_path(v_ref)[0]}
    fused_paths = {tuple(str(k) for k in p): (l.shape, l.dtype) for p, l in
                   jax.tree_util.tree_flatten_with_path(v_fused)[0]}
    assert ref_paths == fused_paths

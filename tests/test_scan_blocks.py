"""scan-over-MBConv-repeats (cfg.scan_blocks): exact eval parity with the
unrolled backbone, param-layout (un)stack shims, and checkpoint-layout
adaptation across the train/eval CLIs."""
import numpy as np

import jax
import jax.numpy as jnp


def test_efficientnet_scan_exact_parity():
    from segtran_tpu.nn.backbones.efficientnet import (
        EfficientNetFeatures, stack_mbconv_params, unstack_mbconv_params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    base = EfficientNetFeatures(variant="eff-b0", scan_blocks=False)
    v = base.init(jax.random.PRNGKey(0), x)
    f_base = base.apply(v, x)

    scanm = EfficientNetFeatures(variant="eff-b0", scan_blocks=True)
    sv = {"params": stack_mbconv_params(v["params"], "eff-b0"),
          "batch_stats": stack_mbconv_params(v["batch_stats"], "eff-b0")}
    assert (jax.tree_util.tree_structure(sv)
            == jax.tree_util.tree_structure(
                scanm.init(jax.random.PRNGKey(0), x)))
    f_scan = scanm.apply(sv, x)
    for a, b in zip(f_base, f_scan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # unstack is the exact inverse
    rt = unstack_mbconv_params(sv["params"], "eff-b0")
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(v["params"]),
            jax.tree_util.tree_leaves_with_path(rt)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # train-mode grads flow through the scan
    def loss(p):
        out, _ = scanm.apply(
            {"params": p, "batch_stats": sv["batch_stats"]}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
    g = jax.grad(loss)(sv["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_segtran2d_scan_full_model_parity():
    """Full Segtran2d logits identical between scan and unrolled backbones
    (maybe_adapt_scan_layout restacks the whole variables tree)."""
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.backbones.efficientnet import maybe_adapt_scan_layout
    from segtran_tpu.nn.init import init_with_reference_schemes

    x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32)
    kw = dict(backbone_type="eff-b0", num_classes=3, num_attractors=8,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg = Segtran2dConfig(**kw).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran2d(cfg)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    y = model.apply({"params": params, **rest}, x, train=False)

    cfg_s = Segtran2dConfig(**kw, scan_blocks=True).derive(
        translayer_compress_ratios=(1.0, 1.0))
    model_s = Segtran2d(cfg_s)
    params_s = maybe_adapt_scan_layout(params, "eff-b0", True)
    rest_s = {k: maybe_adapt_scan_layout(v, "eff-b0", True)
              for k, v in rest.items()}
    y_s = model_s.apply({"params": params_s, **rest_s}, x, train=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_s))

"""Fused-attention model path == exact XLA path (CPU interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from segtran_tpu.configs import Segtran2dConfig
from segtran_tpu.models import Segtran2d
from segtran_tpu.nn.init import init_with_reference_schemes


def test_fused_attention_model_parity():
    import dataclasses
    base = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=3, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 2.0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)

    model = Segtran2d(base)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    y_exact = model.apply({"params": params, **rest}, x, train=False)

    fused_cfg = dataclasses.replace(base, use_fused_attention=True)
    model_f = Segtran2d(fused_cfg)
    y_fused = model_f.apply({"params": params, **rest}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_exact),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_plus_epilogue_3d_parity():
    """The BraTS bench configuration composes BOTH Pallas paths: flash
    squeezed attention (finish_from_mid_premul) feeding the fused expansion
    epilogue (_output_and_pool -> fused_private_output_pool). The composed
    3D model must match the exact XLA path."""
    import dataclasses
    from segtran_tpu.configs import Segtran3dConfig
    from segtran_tpu.models.segtran3d import Segtran3d

    base = Segtran3dConfig(
        num_classes=4, num_attractors=8, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 16, 4),
                    jnp.float32)
    model = Segtran3d(base)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    y_exact = model.apply({"params": params, **rest}, x, train=False)
    both = dataclasses.replace(base, use_fused_attention=True,
                               use_fused_epilogue=True)
    y_both = Segtran3d(both).apply({"params": params, **rest}, x,
                                   train=False)
    np.testing.assert_allclose(np.asarray(y_both), np.asarray(y_exact),
                               rtol=1e-4, atol=1e-4)


def test_remat_forward_parity_and_grad():
    """cfg.remat must not change numerics (beyond float noise) and must
    backprop through the checkpointed backbone+encoder."""
    import dataclasses
    base = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=2, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        remat=True,
    ).derive(translayer_compress_ratios=(1.0, 4.0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    m1 = Segtran2d(base)
    m2 = Segtran2d(dataclasses.replace(base, remat=False))
    params, rest = init_with_reference_schemes(
        m1, {"params": jax.random.PRNGKey(0)}, x)
    o1 = m1.apply({"params": params, **rest}, x, train=False)
    o2 = m2.apply({"params": params, **rest}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    def loss(p):
        out, _ = m1.apply({"params": p, **rest}, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)},
                          mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_remat_blocks_grad_parity():
    """cfg.remat_blocks (per-MBConv jax.checkpoint, the round-4 backward-HBM
    fix) must leave forward logits AND gradients identical to the baseline --
    rematerialization is exact recomputation, not an approximation."""
    import dataclasses
    base = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=2, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 2.0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    m1 = Segtran2d(base)
    m2 = Segtran2d(dataclasses.replace(base, remat_blocks=True))
    params, rest = init_with_reference_schemes(
        m1, {"params": jax.random.PRNGKey(0)}, x)

    def make_loss(m):
        def loss(p):
            out, _ = m.apply({"params": p, **rest}, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(3)},
                             mutable=["batch_stats"])
            return jnp.mean(out ** 2)
        return loss

    o1 = m1.apply({"params": params, **rest}, x, train=False)
    o2 = m2.apply({"params": params, **rest}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    g1 = jax.jit(jax.grad(make_loss(m1)))(params)
    g2 = jax.jit(jax.grad(make_loss(m2)))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g1, g2)


def test_dw_stencil_model_parity():
    """cfg.dw_stencil (shifted-slice depthwise lowering) must produce the
    same logits and param tree as the grouped-conv path -- exact math, only
    the K^2 tap summation is reassociated."""
    import dataclasses
    base = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=2, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 2.0))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    m1 = Segtran2d(base)
    m2 = Segtran2d(dataclasses.replace(base, dw_stencil=True))
    params, rest = init_with_reference_schemes(
        m1, {"params": jax.random.PRNGKey(0)}, x)
    params2, _ = init_with_reference_schemes(
        m2, {"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    o1 = m1.apply({"params": params, **rest}, x, train=False)
    o2 = m2.apply({"params": params, **rest}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-5)

"""Second zoo batch: TransUNet, SETR-PUP, DeepLabV3+, PraNet, DUNet."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _fwd(model, x, **apply_kw):
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model.apply(params, x, train=False, **apply_kw)


def test_transunet():
    from segtran_tpu.models.transunet import TransUNet
    m = TransUNet(num_classes=3, num_layers=2, hidden_dim=96, num_heads=4,
                  mlp_dim=192, decoder_channels=(64, 32, 16, 8),
                  backbone="resnet18")
    out = _fwd(m, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_setr_pup():
    from segtran_tpu.models.setr import SETR_PUP
    m = SETR_PUP(num_classes=3, depth=2, embed_dim=96, num_heads=4,
                 mlp_ratio=2.0)
    out = _fwd(m, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # train-mode gradient smoke (dropout rng + mutable BN stats)
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p):
        y, _ = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                       x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_deeplab():
    from segtran_tpu.models.deeplab import DeepLabV3Plus
    m = DeepLabV3Plus(num_classes=2, backbone="resnet18")
    out = _fwd(m, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 2)


def test_pranet():
    from segtran_tpu.models.pranet import PraNet
    m = PraNet()
    outs = _fwd(m, jnp.ones((1, 64, 64, 3)))
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 64, 64, 1)
        assert np.isfinite(np.asarray(o)).all()


def test_deform_conv_and_dunet():
    from segtran_tpu.ops.deform_conv import DeformConv2d
    m = DeformConv2d(8, 3, padding=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 4),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 16, 16, 8)
    # zero-init offsets: first application == regular 3x3 conv over taps;
    # gradient must flow into the offset conv
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    pg = g["params"]["p_conv"]["kernel"]
    assert float(jnp.sum(jnp.abs(pg))) > 0

    from segtran_tpu.models.dunet import DUNetV1V2
    du = DUNetV1V2(n_classes=2)
    out = _fwd(du, jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 2)


def test_segtran2d_effv2_backbone():
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    cfg = Segtran2dConfig(
        backbone_type="effv2s", num_classes=2, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 2.0))
    m = Segtran2d(cfg)
    x = jnp.ones((1, 64, 64, 3))
    params, rest = init_with_reference_schemes(
        m, {"params": jax.random.PRNGKey(0)}, x)
    out = m.apply({"params": params, **rest}, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()

"""Baseline model zoo: forward shapes + gradient flow smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _init_and_forward(model, x, train=False):
    from segtran_tpu.nn.init import init_with_reference_schemes
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    variables = {"params": params, **rest}
    kwargs = {}
    if train:
        kwargs = {"rngs": {"dropout": jax.random.PRNGKey(2)},
                  "mutable": ["batch_stats"]}
        out, _ = model.apply(variables, x, train=True, **kwargs)
    else:
        out = model.apply(variables, x, train=False)
    return out


def test_attunet_variants():
    from segtran_tpu.models.att_unet import AttUNet
    x = jnp.ones((1, 64, 64, 3))
    for use_att, rec in [(True, False), (False, False), (True, True)]:
        out = _init_and_forward(
            AttUNet(num_classes=3, use_attention=use_att, recurrent=rec), x)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_nested_unet():
    from segtran_tpu.models.nested_unet import NestedUNet
    x = jnp.ones((1, 64, 64, 3))
    out = _init_and_forward(NestedUNet(num_classes=2), x)
    assert out.shape == (1, 64, 64, 2)
    outs = _init_and_forward(NestedUNet(num_classes=2,
                                        deep_supervision=True), x)
    assert len(outs) == 4 and outs[0].shape == (1, 64, 64, 2)


def test_unet3plus():
    from segtran_tpu.models.unet_3plus import UNet3Plus
    x = jnp.ones((1, 64, 64, 3))
    out = _init_and_forward(UNet3Plus(num_classes=2), x)
    assert out.shape == (1, 64, 64, 2)


def test_vnet():
    from segtran_tpu.models.vnet import VNet
    x = jnp.ones((1, 32, 32, 16, 1))
    out = _init_and_forward(VNet(n_channels=1, num_classes=2,
                                 normalization="groupnorm"), x)
    assert out.shape == (1, 32, 32, 16, 2)


def test_unet3d():
    from segtran_tpu.models.unet3d import Modified3DUNet
    x = jnp.ones((1, 32, 32, 16, 4))
    out = _init_and_forward(Modified3DUNet(in_channels=4, num_classes=4), x)
    assert out.shape == (1, 32, 32, 16, 4)


def test_zoo_gradients_flow():
    from segtran_tpu.models.att_unet import AttUNet
    from segtran_tpu.nn.init import init_with_reference_schemes
    model = AttUNet(num_classes=2)
    x = jnp.ones((1, 32, 32, 3))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)

    def loss(p):
        out, _ = model.apply({"params": p, **rest}, x, train=True,
                             mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.sum(jnp.abs(v)))
             for v in jax.tree_util.tree_leaves(g)]
    assert sum(n > 0 for n in norms) > len(norms) * 0.5

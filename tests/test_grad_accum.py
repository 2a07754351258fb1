"""Gradient accumulation (--gradaccum): the scan-of-microbatches step must
produce the EXACT full-batch mean gradient (losses are per-example means), so
one step with grad_accum=N from the same state lands on identical params.

The reference has no counterpart (a bigger batch on GPU simply OOMs,
train2d.py:1134); on TPU the accumulation scan keeps activation memory at one
microbatch while the optimizer sees the full-batch gradient.
"""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from segtran_tpu.train.trainer import (build_optimizer, create_train_state,
                                       make_loss_fn, make_train_step)


class TinyNet(nn.Module):
    """BN-free so train-mode microbatch normalization can't perturb grads."""
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


def _batch(b=8, hw=16, c=3):
    rng = np.random.RandomState(0)
    img = rng.rand(b, hw, hw, 3).astype(np.float32)
    mask = np.zeros((b, hw, hw, c), np.float32)
    mask[..., 0] = 1.0
    mask[..., 1] = img.mean(-1) > 0.5
    mask[..., 2] = img.mean(-1) > 0.75
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


def _one_step(grad_accum, batch):
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), batch["image"][:1])["params"]
    tx = build_optimizer(lr=1e-3, t_total=10)
    loss_fn = make_loss_fn(num_classes=3, bce_weight=[0.0, 1.0, 2.0])
    step = jax.jit(make_train_step(model, tx, loss_fn,
                                   has_batch_stats=False,
                                   grad_accum=grad_accum))
    state = create_train_state(params, {}, tx, jax.random.PRNGKey(1))
    state, metrics = step(state, batch)
    return state, metrics


@pytest.mark.parametrize("accum", [2, 4])
def test_grad_accum_matches_full_batch(accum):
    batch = _batch(8)
    s1, m1 = _one_step(1, batch)
    sa, ma = _one_step(accum, batch)
    assert int(sa.step) == 1
    np.testing.assert_allclose(float(ma["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flata = jax.tree_util.tree_leaves(sa.params)
    for a, b in zip(flat1, flata):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_grad_accum_segtran2d_smoke():
    """Full Segtran2d (BN backbone): stats thread through the scan, loss
    finite. BN normalizes per microbatch so exact equality isn't expected."""
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes

    cfg = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=3, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 4.0))
    model = Segtran2d(cfg)
    batch = _batch(4, hw=64)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, batch["image"][:1])
    tx = build_optimizer(lr=1e-4, t_total=10)
    loss_fn = make_loss_fn(num_classes=3, bce_weight=[0.0, 1.0, 2.0])
    step = jax.jit(make_train_step(model, tx, loss_fn, grad_accum=2))
    state = create_train_state(params, rest["batch_stats"], tx,
                               jax.random.PRNGKey(1))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # BN stats actually moved (threaded through the scan, not dropped)
    before = jax.tree_util.tree_leaves(rest["batch_stats"])
    after = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(before, after))

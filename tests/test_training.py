"""Training-step tests: loss decreases on a synthetic task, and the sharded
step runs on a virtual 8-device mesh (the DDP-replacement path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtran_tpu.configs import Segtran2dConfig
from segtran_tpu.models import Segtran2d
from segtran_tpu.nn.init import init_with_reference_schemes
from segtran_tpu.train.trainer import (build_optimizer, create_train_state,
                                       make_loss_fn, make_train_step)
from segtran_tpu.parallel.mesh import (make_mesh, replicate_to_mesh,
                                       shard_batch_to_mesh, shard_train_step)


def tiny_model():
    cfg = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=3, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 4.0))
    return Segtran2d(cfg), cfg


def synthetic_batch(rng, b, hw=64, num_classes=3):
    img = rng.rand(b, hw, hw, 3).astype(np.float32)
    # class 1 = bright region, class 2 = subset of it (fundus-like nesting)
    bright = (img.mean(-1) > 0.55)
    mask = np.zeros((b, hw, hw, num_classes), np.float32)
    mask[..., 0] = 1.0
    mask[..., 1] = bright
    mask[..., 2] = (img.mean(-1) > 0.75)
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


@pytest.fixture(scope="module")
def setup():
    model, cfg = tiny_model()
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, 8)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, batch["image"][:1])
    tx = build_optimizer(lr=5e-4, decay=1e-4, t_total=50, warmup_ratio=0.1,
                         grad_clip=0.1)
    state = create_train_state(params, rest["batch_stats"], tx,
                               jax.random.PRNGKey(1))
    loss_fn = make_loss_fn(num_classes=3, bce_weight=[0.0, 1.0, 2.0])
    step = make_train_step(model, tx, loss_fn)
    return model, state, step, batch


def test_loss_decreases(setup):
    _, state, step, batch = setup
    step = jax.jit(step)
    losses = []
    for i in range(14):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # warmup occupies the first 5 steps; compare early vs late averages
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) - 1e-3, losses


def test_sharded_train_step_8dev(setup):
    model, state, step, batch = setup
    mesh = make_mesh(8)
    sharded = shard_train_step(step, mesh, donate_state=False)
    state_m = replicate_to_mesh(state, mesh)
    batch_m = shard_batch_to_mesh(batch, mesh)
    state2, metrics = sharded(state_m, batch_m)
    assert np.isfinite(float(metrics["loss"]))
    # one more step to ensure state shardings round-trip
    state3, metrics2 = sharded(state2, batch_m)
    assert np.isfinite(float(metrics2["loss"]))


def test_sharded_matches_single_device(setup):
    """DP over 8 virtual devices must be numerically the global-batch step."""
    model, state, step, batch = setup
    single = jax.jit(step)
    s1, m1 = single(state, batch)
    mesh = make_mesh(8)
    sharded = shard_train_step(step, mesh, donate_state=False)
    s8, m8 = sharded(replicate_to_mesh(state, mesh),
                     shard_batch_to_mesh(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

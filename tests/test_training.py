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
    # eff-tiny: sharding/training-loop semantics are identical to eff-b4 but
    # the 1-core CPU host can afford the compile (eff-b0 parity vs the torch
    # oracle is covered by test_segtran2d_parity / test_eff_backbone_convert).
    cfg = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=3, num_attractors=8,
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


def test_tensor_parallel_2d_mesh_matches_single_device(setup):
    """(2 data x 4 model) mesh with Megatron-style GSPMD weight sharding:
    two steps must match the unsharded step numerically, and the big FFN
    kernels (and their BertAdam moments) must actually be sharded."""
    from segtran_tpu.parallel.tensor_parallel import (
        shard_state_to_mesh, shard_train_step_2d, state_sharding_spec)
    model, state, step, batch = setup

    ref_state = state
    sstep = jax.jit(step)
    for _ in range(2):
        ref_state, ref_metrics = sstep(ref_state, batch)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    state_m, spec = shard_state_to_mesh(state, mesh, min_size=1 << 14)
    tp_step = shard_train_step_2d(step, mesh, spec, donate_state=False)
    batch_m = shard_batch_to_mesh(batch, mesh)
    for _ in range(2):
        state_m, metrics = tp_step(state_m, batch_m)

    assert np.allclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                       rtol=1e-4, atol=1e-5)
    # at least one large param (+ moment) is genuinely model-sharded
    sharded_leaves = [
        s for s in jax.tree_util.tree_leaves(
            spec, is_leaf=lambda x: hasattr(x, "spec"))
        if any(p == "model" for p in tuple(s.spec))]
    assert len(sharded_leaves) > 4, "weight sharding rule matched nothing"
    # params agree with the unsharded run
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                           b.astype(jnp.float32)))),
        jax.device_get(state_m.params), jax.device_get(ref_state.params))
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4, (
        sorted(jax.tree_util.tree_leaves(diffs))[-3:])


def test_train2d_cli_tensor_parallel(tmp_path):
    """--tp 4 on the virtual 8-device mesh through the training CLI."""
    import os
    import shutil
    FUNDUS_DIR = "/root/reference/data/fundus/train"
    if not os.path.isdir(FUNDUS_DIR):
        pytest.skip("sample data not available")
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    from segtran_tpu.cli.train2d import main
    ckpt = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "128", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "m"),
        "--ndevices", "8", "--tp", "4",
    ])
    assert os.path.isdir(os.path.join(ckpt, "iter_2"))

    # bad tp must fail before model init
    with pytest.raises(ValueError, match="--tp 3"):
        main(["--task", "fundus", "--dataroot", str(data_root),
              "--ckptdir", str(tmp_path / "m2"), "--ndevices", "8",
              "--tp", "3"])


def test_async_checkpoint_roundtrip(tmp_path):
    from segtran_tpu.train.checkpoint import (load_checkpoint,
                                              save_checkpoint,
                                              wait_for_saves)
    params = {"w": jnp.arange(12.0).reshape(3, 4)}
    stats = {"bn": {"mean": jnp.ones(4)}}
    path = save_checkpoint(str(tmp_path), 3, params, stats, async_save=True)
    wait_for_saves()
    payload = load_checkpoint(path)
    np.testing.assert_array_equal(payload["params"]["w"],
                                  np.arange(12.0).reshape(3, 4))
    np.testing.assert_array_equal(payload["batch_stats"]["bn"]["mean"],
                                  np.ones(4))


def test_tensor_parallel_rule_edges():
    """Shape-based sharding rule: small leaves, scalars, and
    indivisible dims stay replicated; ties pick the widest divisible dim."""
    from segtran_tpu.parallel.tensor_parallel import leaf_sharding_rule
    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    rule = leaf_sharding_rule(mesh, min_size=1 << 14)
    # scalar / vector / small kernel -> replicated
    assert tuple(rule(jnp.zeros(())).spec) == ()
    assert tuple(rule(jnp.zeros(1280)).spec) == ()
    assert tuple(rule(jnp.zeros((64, 64))).spec) == ()
    # big kernel: widest divisible dim sharded
    assert tuple(rule(jnp.zeros((1280, 320))).spec) == ("model", None)
    assert tuple(rule(jnp.zeros((320, 1280))).spec) == (None, "model")
    # widest dim not divisible by 4 -> falls back to the next widest
    assert tuple(rule(jnp.zeros((1283, 512))).spec) == (None, "model")
    # nothing divisible -> replicated (P()) even if large
    assert tuple(rule(jnp.zeros((1283, 517, 33))).spec) == ()
    # 3D einsum kernel [M, F, F]
    assert "model" in tuple(rule(jnp.zeros((4, 256, 256))).spec)

"""Expert parallelism over Segtran's attention modes (parallel/expert.py +
the expert_dim_size preference in tensor_parallel.leaf_sharding_rule)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtran_tpu.parallel.mesh import make_mesh, shard_batch_to_mesh


def test_mode_sharded_ffn_aggregate_exact():
    """shard_map primitive == MMPrivateMid (eval) + LearnedSoftAggregate."""
    from segtran_tpu.nn.attention import LearnedSoftAggregate, MMPrivateMid
    from segtran_tpu.parallel.expert import mode_sharded_ffn_aggregate

    b, m, u, f = 2, 4, 6, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, m, u, f) * 0.5, jnp.float32)

    ffn = MMPrivateMid(num_modes=m, feat_dim=f, hidden_dropout_prob=0.0)
    fv = ffn.init(jax.random.PRNGKey(0), x)
    y = ffn.apply(fv, x, deterministic=True)
    agg = LearnedSoftAggregate(num_feat=f, group_dim=1)
    av = agg.init(jax.random.PRNGKey(1), y)
    want = agg.apply(av, y)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    got = mode_sharded_ffn_aggregate(
        x, fv["params"]["group_linear"]["kernel"],
        fv["params"]["group_linear"]["bias"],
        av["params"]["feat2score"]["kernel"],
        av["params"]["feat2score"]["bias"], mesh, "model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_expert_rule_prefers_mode_dim():
    from segtran_tpu.parallel.tensor_parallel import leaf_sharding_rule
    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    rule = leaf_sharding_rule(mesh, min_size=1 << 14, expert_dim_size=4)
    # per-mode einsum kernel [M, F, F]: leading (mode) dim sharded even
    # though F is wider
    assert tuple(rule(jnp.zeros((4, 256, 256))).spec) == ("model", None, None)
    # per-mode bias [M, F] sharded on modes regardless of size
    assert tuple(rule(jnp.zeros((4, 256))).spec) == ("model", None)
    # non-mode leaves keep the widest-divisible-dim behavior
    assert tuple(rule(jnp.zeros((1280, 320))).spec) == ("model", None)
    # mode dim not divisible by the axis -> widest-dim fallback
    rule3 = leaf_sharding_rule(mesh, min_size=1 << 14, expert_dim_size=3)
    assert tuple(rule3(jnp.zeros((3, 256, 256))).spec) == (None, "model", None)


def test_expert_sharded_training_matches_single_device():
    """Two GSPMD expert-sharded train steps match the unsharded step, with
    the per-mode kernels genuinely mode-sharded."""
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.parallel.tensor_parallel import (shard_state_to_mesh,
                                                      shard_train_step_2d)
    from segtran_tpu.train.trainer import (build_optimizer,
                                           create_train_state, make_loss_fn,
                                           make_train_step)
    from tests.test_training import synthetic_batch, tiny_model

    model, cfg = tiny_model()
    rng = np.random.RandomState(1)
    batch = synthetic_batch(rng, 8)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, batch["image"][:1])
    tx = build_optimizer(lr=5e-4, decay=1e-4, t_total=50, warmup_ratio=0.1,
                         grad_clip=0.1)
    state = create_train_state(params, rest["batch_stats"], tx,
                               jax.random.PRNGKey(1))
    loss_fn = make_loss_fn(num_classes=3, bce_weight=[0.0, 1.0, 2.0])
    step = make_train_step(model, tx, loss_fn)

    ref_state, ref_metrics = state, None
    sstep = jax.jit(step)
    for _ in range(2):
        ref_state, ref_metrics = sstep(ref_state, batch)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    state_m, spec = shard_state_to_mesh(state, mesh, min_size=1 << 14,
                                        expert_dim_size=cfg.num_modes)
    ep_step = shard_train_step_2d(step, mesh, spec, donate_state=False)
    batch_m = shard_batch_to_mesh(batch, mesh)
    metrics = None
    for _ in range(2):
        state_m, metrics = ep_step(state_m, batch_m)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-4, atol=1e-5)
    # some leaf is sharded on its LEADING mode dim
    mode_sharded = [
        s for s in jax.tree_util.tree_leaves(
            spec, is_leaf=lambda x: hasattr(x, "spec"))
        if tuple(s.spec)[:1] == ("model",) and len(tuple(s.spec)) == 3]
    assert mode_sharded, "no [M, F, F] kernel was mode-sharded"
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        jax.device_get(state_m.params), jax.device_get(ref_state.params))
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4

"""GSPMD spatially-sharded whole-volume inference: the H-sharded multi-chip
forward must match the single-device forward bit-for-bit-ish (fp32 on the
virtual 8-device CPU mesh)."""
import numpy as np

import jax
import jax.numpy as jnp


def test_sharded_whole_volume_matches_single_device():
    from segtran_tpu.configs import Segtran3dConfig
    from segtran_tpu.models.segtran3d import Segtran3d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.parallel.mesh import make_mesh
    from segtran_tpu.parallel.spatial import sharded_whole_volume_apply

    cfg = Segtran3dConfig(
        num_classes=4, num_attractors=8, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran3d(cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, 64, 64, 16, 4).astype(np.float32))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x[:1])
    variables = {"params": params, **rest}

    y_single = model.apply(variables, x, train=False)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    fn, vol_sharding = sharded_whole_volume_apply(model, mesh)
    y_sharded = fn(variables, jax.device_put(x, vol_sharding))

    assert y_sharded.sharding.is_equivalent_to(vol_sharding, y_sharded.ndim)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_single),
                               rtol=1e-4, atol=1e-4)


def test_sharded_whole_volume_model_axis_only():
    """Mesh with no data axis > 1: a single volume sharded over all chips."""
    from segtran_tpu.configs import Segtran3dConfig
    from segtran_tpu.models.segtran3d import Segtran3d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.parallel.mesh import make_mesh
    from segtran_tpu.parallel.spatial import sharded_whole_volume_apply

    cfg = Segtran3dConfig(
        num_classes=2, num_attractors=8, orig_in_channels=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran3d(cfg)
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 64, 64, 16, 1).astype(np.float32))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    variables = {"params": params, **rest}

    y_single = model.apply(variables, x, train=False)
    mesh = make_mesh(8, axes=("data", "model"), shape=(1, 8))
    fn, vol_sharding = sharded_whole_volume_apply(model, mesh)
    y_sharded = fn(variables, jax.device_put(x, vol_sharding))
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_single),
                               rtol=1e-4, atol=1e-4)


def test_test3d_spatialshard_cli(tmp_path):
    """--wholevol --spatialshard through the eval CLI on the 8-device mesh."""
    import os
    from test_cli3d import make_brats_fixture
    root = tmp_path / "data"
    make_brats_fixture(str(root), n=1, shape=(32, 32, 16))
    from segtran_tpu.cli.train3d import main as train_main
    ckpt = train_main([
        "--task", "brats", "--split", "all", "--maxiter", "1",
        "--saveiter", "1", "--translayers", "1", "--bs", "1",
        "--attractors", "8", "--patchsize", "32,32,16",
        "--inputsize", "32,32,16", "--dataroot", str(root),
        "--ckptdir", str(tmp_path / "m"), "--ndevices", "1",
    ])
    from segtran_tpu.cli.test3d import main as eval_main
    results = eval_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--patchsize", "32,32,16", "--inputsize", "32,32,16",
        "--cpdir", ckpt, "--iters", "1", "--wholevol", "--spatialshard",
        "--dataroot", str(root),
    ])
    assert results

"""Learned vCDR estimator training losses (reference train2d.py:1288-1312,
estimator built at :1034-1042, estimate_vcdr at :655-664)."""
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


def _make_setup(scheme, estim_start, net_start, maxiter=4):
    """Build the step + state the way cli.train2d.main does, tiny shapes."""
    import argparse
    from segtran_tpu.cli.train2d import build_argparser, make_full_step
    from segtran_tpu.configs.presets import TASK_SETTINGS
    from segtran_tpu.data.augment import Aug2dConfig
    from segtran_tpu.models.discriminator import Discriminator
    from segtran_tpu.models.unet2d import VanillaUNet
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.train.trainer import (build_optimizer,
                                           create_train_state)

    args = build_argparser().parse_args([
        "--task", "fundus", "--net", "unet-scratch",
        "--vcdr", scheme, "--vcdrestimstart", str(estim_start),
        "--vcdrnetstart", str(net_start),
        "--origsize", "64", "--patchsize", "64",
        "--maxiter", str(maxiter), "--randscale", "0",
    ])
    task = dict(TASK_SETTINGS["fundus"])
    task["orig_input_size"] = (64, 64)
    task["patch_size"] = (64, 64)
    model = VanillaUNet(n_channels=3, num_classes=3)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    batch_stats = rest.get("batch_stats", {})

    names = ("vc_estim", "vd_estim") if scheme == "sep" else ("vcdr_estim",)
    vcdr_models = {}
    params = {"net": params}
    batch_stats = {"net": batch_stats}
    for i, nm in enumerate(names):
        m = Discriminator(num_classes=1, do_avgpool=True, do_revgrad=False)
        vp, vr = init_with_reference_schemes(
            m, {"params": jax.random.PRNGKey(9 + i)},
            jnp.zeros((1, 64, 64, 3), jnp.float32))
        vcdr_models[nm] = m
        params[nm] = vp
        batch_stats[nm] = vr.get("batch_stats", {})

    tx = build_optimizer(lr=1e-3, decay=0.0, t_total=maxiter,
                         warmup_ratio=0.0, grad_clip=0.0)
    state = create_train_state(params, batch_stats, tx,
                               jax.random.PRNGKey(2))
    aug = Aug2dConfig(randscale=0.0, gray_alpha=0.5,
                      mean=(0.5,) * 3, std=(0.25,) * 3)
    step = make_full_step(model, tx, task, args, aug, (64, 64),
                          vcdr_models=vcdr_models)
    return step, state


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(2, 64, 64, 3).astype(np.float32)
    # raw fundus masks: 0 bg / 1 disc / 2 cup (fundus_map_mask input space)
    raw = np.zeros((2, 64, 64, 1), np.float32)
    raw[:, 16:48, 16:48] = 1.0
    raw[:, 24:40, 24:40] = 2.0
    return {"image": jnp.asarray(image), "mask": jnp.asarray(raw)}


@pytest.mark.parametrize("scheme", ["single", "sep"])
def test_vcdr_losses_wired_and_finite(scheme):
    step, state = _make_setup(scheme, estim_start=0, net_start=0)
    jit_step = jax.jit(step)
    state, metrics = jit_step(state, _batch())
    for key in ("vcdr_loss", "vcdr_estim_loss", "vcdr_net_loss"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key
    # active from iteration 0: the combined loss includes both terms
    expect = float(metrics["vcdr_estim_loss"] + metrics["vcdr_net_loss"])
    assert float(metrics["vcdr_loss"]) == pytest.approx(expect, rel=1e-5)
    # estimator params actually get gradients: a second step changes them
    p0 = state.params[("vcdr_estim" if scheme == "single" else "vc_estim")]
    state2, _ = jit_step(state, _batch(1))
    p1 = state2.params[("vcdr_estim" if scheme == "single" else "vc_estim")]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0, \
        "estimator params did not update"


def test_vcdr_start_iteration_gating():
    """Before vcdrestimstart the loss is 0; between the two starts only the
    estimator loss contributes (reference train2d.py:1289-1311)."""
    step, state = _make_setup("single", estim_start=1, net_start=2)
    jit_step = jax.jit(step)
    # step counter 0: fully gated off
    state, m0 = jit_step(state, _batch())
    assert float(m0["vcdr_loss"]) == 0.0
    # step counter 1: estimator loss only
    state, m1 = jit_step(state, _batch(1))
    assert float(m1["vcdr_loss"]) == pytest.approx(
        float(m1["vcdr_estim_loss"]), rel=1e-5)
    # step counter 2: both
    _, m2 = jit_step(state, _batch(2))
    assert float(m2["vcdr_loss"]) == pytest.approx(
        float(m2["vcdr_estim_loss"] + m2["vcdr_net_loss"]), rel=1e-5)


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_train2d_cli_vcdr_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--vcdr", "single", "--vcdrestimstart", "0", "--vcdrnetstart", "0",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64", "--attractors", "8",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

"""Few-shot DA training path end-to-end: polyformer target mode with
adversarial feature alignment + reconstruction (the reference's phase-3
recipe, README_polyformer.md:13-17 / train2d.py:1259-1286)."""
import os
import shutil

import jax
import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_polyformer_target_with_adversarial_da(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "rim")
    for d in ("train", "rim"):
        for f in (data_root / "fundus" / d).glob("*.list"):
            f.unlink()

    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--polyformer", "target", "--targetopt", "k",
        "--adv", "feat", "--sourceds", "train", "--ds", "rim",
        "--reconweight", "0.1",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--attractors", "8",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))
    # training log mentions the DA losses
    log = open(os.path.join(ckpt_dir, "log.txt")).read()
    assert "source-domain samples" in log


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_adversarial_da_nonsquare_grid(tmp_path):
    """--adv mask + --attnconsist on a NON-SQUARE input (like the oct task's
    288x512): the attention-consistency plumbing must use the real (h2, w2)
    FPN grid, not sqrt(N) (round-1 square-grid bug)."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--adv", "mask", "--sourceds", "train",
        "--attnconsist",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64,128", "--patchsize", "64,128",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_adda_discriminator_full_lr(tmp_path):
    """ADDA optimizer-split semantics (reference train2d.py:1070-1073): the
    discriminator trains on the UNSCALED domain loss -- its update must be
    invariant to --domweight -- while the generator's adversarial gradient
    scales with it, so the net update must differ."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "rim")
    for d in ("train", "rim"):
        for f in (data_root / "fundus" / d).glob("*.list"):
            f.unlink()

    from segtran_tpu.cli.train2d import main
    from segtran_tpu.train.checkpoint import load_checkpoint

    def run(domweight, tag):
        ckpt_dir = main([
            "--task", "fundus", "--split", "all", "--net", "unet-scratch",
            "--adv", "feat", "--adda", "--sourceds", "train", "--ds", "rim",
            "--domweight", str(domweight), "--seed", "7",
            "--maxiter", "1", "--saveiter", "1", "--bs", "2",
            "--origsize", "64", "--patchsize", "64", "--attractors", "8",
            "--dataroot", str(data_root),
            "--ckptdir", str(tmp_path / f"model_{tag}"), "--ndevices", "1",
        ])
        return load_checkpoint(os.path.join(ckpt_dir, "iter_1"))["params"]

    p_hi = run(0.5, "hi")
    p_lo = run(0.001, "lo")
    d_hi = jax.tree_util.tree_leaves(p_hi["discriminator"])
    d_lo = jax.tree_util.tree_leaves(p_lo["discriminator"])
    for a, b in zip(d_hi, d_lo):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    n_hi = np.concatenate([np.ravel(v) for v in
                           jax.tree_util.tree_leaves(p_hi["net"])])
    n_lo = np.concatenate([np.ravel(v) for v in
                           jax.tree_util.tree_leaves(p_lo["net"])])
    assert np.abs(n_hi - n_lo).max() > 1e-7


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_contrastive_reference_feature_training(tmp_path):
    """--contrastweight + --reffeatcp: the reference-feature contrastive
    losses (reference internal_util.py:154-194) run end-to-end and appear in
    the metrics log."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    # synthesize a --savefeat-format bank whose channel dim matches the
    # net's _da_feature output (unet-scratch last decoder feature: 64ch)
    rng = np.random.RandomState(0)
    np.savez(tmp_path / "bank.npz",
             features=rng.randn(90, 64).astype(np.float16),
             labels=np.repeat([0, 1, 2], 30))

    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--contrastweight", "0.01", "--negcontrast",
        "--reffeatcp", str(tmp_path / "bank.npz"), "--numreffeat", "30",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))
    log = open(os.path.join(ckpt_dir, "log.txt")).read()
    assert "reference feature bank" in log


def test_da_feature_nonsquare_reshape():
    """_da_feature must reshape segtran tokens onto the REAL (h2, w2) grid
    (reference net.feature_maps[-1], train2d.py:1259-1286). On a non-square
    grid the round-1 sqrt(N) assumption either crashed or silently
    transposed the map."""
    import jax
    import jax.numpy as jnp
    from segtran_tpu.cli.train2d import _da_feature, _grid_hw
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes

    cfg = Segtran2dConfig(backbone_type="eff-b0", num_classes=3,
                          num_attractors=8).derive(
        translayer_compress_ratios=(1.0, 1.0))
    model = Segtran2d(cfg)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    _, mstate = model.apply({"params": params, **rest}, x, train=False,
                            mutable=["intermediates"])
    h2, w2 = _grid_hw(mstate)
    assert h2 != w2, "fixture must be non-square to exercise the bug"
    assert (64 // h2) == (128 // w2), "grid must preserve aspect ratio"
    feat = _da_feature(mstate)
    assert feat.ndim == 4 and feat.shape[1:3] == (h2, w2), feat.shape

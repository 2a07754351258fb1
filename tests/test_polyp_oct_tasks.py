"""Polyp (SegWhole, binarized masks) and OCT (10-class index masks) task
pipelines end-to-end through the training CLI on the reference's sample data.
Also: Segtran2d multi-modality input path."""
import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

POLYP_DIR = "/root/reference/data/polyp/CVC-ClinicDB-train"
OCT_DIR = "/root/reference/data/oct/duke"


def _copy(src, dst):
    shutil.copytree(src, dst)
    for f in os.listdir(dst):
        if f.endswith(".list"):
            os.remove(os.path.join(dst, f))


@pytest.mark.skipif(not os.path.isdir(POLYP_DIR),
                    reason="sample data not available")
def test_polyp_training_cli(tmp_path):
    root = tmp_path / "data"
    (root / "polyp").mkdir(parents=True)
    _copy(POLYP_DIR, root / "polyp" / "CVC-ClinicDB-train")
    from segtran_tpu.cli.train2d import main
    ckpt = main([
        "--task", "polyp", "--ds", "CVC-ClinicDB-train",
        "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(root), "--ckptdir", str(tmp_path / "m"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt, "iter_2"))


@pytest.mark.skipif(not os.path.isdir(OCT_DIR),
                    reason="sample data not available")
def test_oct_training_cli(tmp_path):
    root = tmp_path / "data"
    (root / "oct").mkdir(parents=True)
    _copy(OCT_DIR, root / "oct" / "duke")
    from segtran_tpu.cli.train2d import main
    ckpt = main([
        "--task", "oct", "--ds", "duke", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64,128", "--patchsize", "64,128",
        "--dataroot", str(root), "--ckptdir", str(tmp_path / "m"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt, "iter_2"))


@pytest.mark.skipif(not os.path.isdir(OCT_DIR),
                    reason="sample data not available")
def test_oct_real_list_file_split(tmp_path):
    """--split train must read the dataset's existing train.list verbatim
    (the reference trusts provided .list files, datasets2d.py:64-83) rather
    than rescanning images/ or regenerating splits."""
    root = tmp_path / "data"
    (root / "oct").mkdir(parents=True)
    _copy(OCT_DIR, root / "oct" / "duke")
    listed = ["images/04-01.png"]
    for name in ("train.list", "test.list", "all.list"):
        with open(root / "oct" / "duke" / name, "w") as f:
            f.write("\n".join(listed) + "\n")

    from segtran_tpu.data.datasets2d import SegCrop
    ds = SegCrop(str(root / "oct" / "duke"), split="train",
                 out_size=(64, 128))
    assert len(ds) == len(listed)
    assert [os.path.basename(n) for n in ds.image_list] == ["04-01.png"]
    sample = ds[0]
    assert sample["image"].shape[:2] == (64, 128)


def test_segtran2d_multimodality():
    """num_modalities > 0: modality folded into batch, max-fused after the
    in-FPN (reference segtran2d.py:321-334, 361-368)."""
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    cfg = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=2, num_attractors=8,
        num_modalities=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 4.0))
    m = Segtran2d(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3, 2),
                    jnp.float32)
    params, rest = init_with_reference_schemes(
        m, {"params": jax.random.PRNGKey(0)}, x)
    out = m.apply({"params": params, **rest}, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()

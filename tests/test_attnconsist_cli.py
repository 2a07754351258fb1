"""Attention-consistency loss through the training CLI (segtran +
--attnconsist), exercising the sown-attention-scores path."""
import os
import shutil

import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_attnconsist_training(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--attnconsist", "--reconweight", "0.05",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "m"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

"""Few-shot DA training path end-to-end: polyformer target mode with
adversarial feature alignment + reconstruction (the reference's phase-3
recipe, README_polyformer.md:13-17 / train2d.py:1259-1286)."""
import os
import shutil

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

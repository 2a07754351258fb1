"""Zoo nets run end-to-end through the 2D training CLI (2 iters each)."""
import os
import shutil

import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    (root / "fundus").mkdir()
    shutil.copytree(FUNDUS_DIR, root / "fundus" / "train")
    for f in (root / "fundus" / "train").glob("*.list"):
        f.unlink()
    return root


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
@pytest.mark.parametrize("net,extra", [
    ("attunet", []),
    ("nnunet", []),
    ("unet", ["--bb", "resnet18"]),
    ("pranet", []),
    # regression: deeplabv3's backbone default was only bound in the
    # transunet/deeplabv3plus branches (UnboundLocalError via the CLI)
    ("deeplabv3", ["--bb", "resnet18"]),
])
def test_train2d_cli_zoo(net, extra, data_root, tmp_path):
    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", net,
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root),
        "--ckptdir", str(tmp_path / "model"), "--ndevices", "1",
    ] + extra)
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

"""--scanblocks CLI checkpoint-layout interop (split from
test_scan_blocks.py: together they overflowed the 600 s command cap on the
1-core host, CLAUDE.md timing table)."""
import os
import shutil

import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_scanblocks_cli_checkpoint_interop(tmp_path):
    """Train WITH --scanblocks, evaluate WITHOUT (and the reverse direction
    via --cp): checkpoints adapt between layouts on load."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.test2d import main as test_main
    from segtran_tpu.cli.train2d import main as train_main
    common = ["--task", "fundus", "--split", "all", "--net", "segtran",
              "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
              "--bs", "2", "--origsize", "64", "--patchsize", "64",
              "--dataroot", str(data_root)]
    ckpt_dir = train_main(common + [
        "--ndevices", "1", "--scanblocks", "--maxiter", "2", "--saveiter",
        "2", "--ckptdir", str(tmp_path / "model")])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

    # scan-layout checkpoint -> unrolled eval
    test_main(common + ["--ds", "train", "--cpdir", ckpt_dir, "--iters", "2",
                        "--outdir", str(tmp_path / "preds")])
    # scan-layout checkpoint -> resume WITHOUT --scanblocks
    ckpt2 = train_main(common + [
        "--ndevices", "1", "--cp", os.path.join(ckpt_dir, "iter_2"),
        "--maxiter", "1", "--saveiter", "1",
        "--ckptdir", str(tmp_path / "model2")])
    assert os.path.isdir(os.path.join(ckpt2, "iter_1"))

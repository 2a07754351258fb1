"""End-to-end 2D training CLI smoke test on the reference's 2-image fundus
sample data: 4 iterations, checkpoint saved & reloadable."""
import os
import shutil

import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_train2d_cli_end_to_end(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main
    ckpt_dir = main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--maxiter", "4", "--saveiter", "4", "--bs", "2",
        "--origsize", "128", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_4"))

    # checkpoint reloads and config validates
    from segtran_tpu.train.checkpoint import load_checkpoint
    from segtran_tpu.configs import Segtran2dConfig
    cfg = Segtran2dConfig(backbone_type="eff-b0", num_classes=3,
                          num_attractors=8).derive(
        translayer_compress_ratios=(1.0, 1.0))
    payload = load_checkpoint(os.path.join(ckpt_dir, "iter_4"), cfg)
    assert "params" in payload and "batch_stats" in payload

    # arch mismatch must abort (reference train2d.py:584-609 semantics)
    bad_cfg = Segtran2dConfig(backbone_type="eff-b1", num_classes=3,
                              num_attractors=8).derive(
        translayer_compress_ratios=(1.0, 1.0))
    with pytest.raises(ValueError):
        load_checkpoint(os.path.join(ckpt_dir, "iter_4"), bad_cfg)

    # a missing iter must fail fast (before model init/compile)
    import time
    from segtran_tpu.cli.test2d import main as eval_main
    t0 = time.time()
    with pytest.raises(FileNotFoundError, match="iter_999"):
        eval_main([
            "--task", "fundus", "--ds", "train", "--split", "all",
            "--net", "segtran", "--bb", "eff-b0", "--translayers", "1",
            "--attractors", "8", "--cpdir", ckpt_dir, "--iters", "999",
            "--origsize", "128", "--patchsize", "64",
            "--dataroot", str(data_root), "--bs", "2",
        ])
    assert time.time() - t0 < 30, "missing-checkpoint check ran after init"

    # --outorigsize pastes crop predictions into the full uncropped frame
    # (REFUGE submission format; reference test_util2d.py:121-132 +
    # uncropped_size preset train2d.py:299-311)
    outdir = tmp_path / "preds_orig"
    eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "segtran", "--bb", "eff-b0", "--translayers", "1",
        "--attractors", "8", "--cpdir", ckpt_dir, "--iters", "4",
        "--origsize", "128", "--patchsize", "64", "--outorigsize",
        "--outdir", str(outdir), "--dataroot", str(data_root), "--bs", "2",
    ])
    from PIL import Image
    pngs = sorted(outdir.glob("*.png"))
    assert pngs, "no masks exported"
    im = np.array(Image.open(pngs[0]))
    assert im.shape == (2056, 2124), im.shape   # the fundus preset's frame


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_train2d_mince_bias_recipe(tmp_path):
    """Mince (multi-scale) attention + 'bias' pos code, trained end-to-end
    and evaluated through test2d (reference train2d.py:210-214 recipe)."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main
    # 'bias' pos codes require the full (non-squeezed) transformer
    # (reference segtran_shared.py:841-844)
    common = [
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--nosqueeze",
        "--mince", "--mincescales", "1,2", "--minceprops", "0.5,0.5",
        "--pos", "bias", "--origsize", "128", "--patchsize", "64",
        "--dataroot", str(data_root),
    ]
    ckpt_dir = main(common + [
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--ckptdir", str(tmp_path / "model"), "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

    from segtran_tpu.cli.test2d import main as eval_main
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "segtran", "--bb", "eff-b0", "--translayers", "1",
        "--attractors", "8", "--nosqueeze",
        "--mince", "--mincescales", "1,2", "--minceprops", "0.5,0.5",
        "--pos", "bias", "--origsize", "128", "--patchsize", "64",
        "--dataroot", str(data_root),
        "--cpdir", ckpt_dir, "--iters", "2", "--bs", "2",
    ])
    assert results, "eval produced no results"

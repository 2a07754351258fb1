"""Raw fundus frame -> disc-centered crop -> train2d, end to end.

Validates the Step_1_Disc_Crop.py replacement (cli/prep_fundus.py): crop
geometry + clamping, the reference filename convention SegCrop parses, the
255/128/0 -> 3-channel annotation remap, and that the emitted dataset trains
with cli/train2d.py unmodified.
"""
import os

import numpy as np
import pytest
from PIL import Image


def _make_raw(tmp_path, n=2, size=(320, 300), disc=(110, 180), r_disc=40,
              r_cup=18):
    """Synthetic REFUGE-style frames: bright disc blob at a known center,
    annotation with 255 bg / 128 disc / 0 cup."""
    img_dir = tmp_path / "raw" / "images"
    mask_dir = tmp_path / "raw" / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    yy, xx = np.mgrid[:size[0], :size[1]]
    d2 = (yy - disc[0]) ** 2 + (xx - disc[1]) ** 2
    for i in range(n):
        rng = np.random.RandomState(i)
        img = (rng.rand(*size, 3) * 60 + 20).astype(np.uint8)
        img[d2 < r_disc ** 2] = (230, 180, 120)
        Image.fromarray(img).save(img_dir / f"g{i:04d}.png")
        lab = np.full(size, 255, np.uint8)
        lab[d2 < r_disc ** 2] = 128
        lab[d2 < r_cup ** 2] = 0
        Image.fromarray(lab).save(mask_dir / f"g{i:04d}.bmp")
    return str(img_dir), str(mask_dir), disc


def test_mask_mode_crop_geometry(tmp_path):
    from segtran_tpu.cli.prep_fundus import main as prep_main
    img_dir, mask_dir, disc = _make_raw(tmp_path)
    out = str(tmp_path / "ds")
    written = prep_main(["--images", img_dir, "--masks", mask_dir,
                         "--out", out, "--roi", "128"])
    assert len(written) == 2
    for fname in written:
        # reference naming: {stem}_{roi}_{x0},{y0}.png
        stem, roi, pos = fname[:-4].split("_")
        assert roi == "128"
        x0, y0 = (int(v) for v in pos.split(","))
        # crop centered on the disc (clamp-aware)
        assert abs(x0 + 64 - disc[0]) <= 2 and abs(y0 + 64 - disc[1]) <= 2
        img = np.asarray(Image.open(os.path.join(out, "images", fname)))
        msk = np.asarray(Image.open(os.path.join(out, "masks", fname)))
        assert img.shape == (128, 128, 3) and msk.shape == (128, 128, 3)
        # remap: ch0 disc incl. cup, ch1 cup, values 0/255
        assert set(np.unique(msk[..., 0])) <= {0, 255}
        assert msk[..., 0].sum() > msk[..., 1].sum() > 0
        assert (msk[..., 1] <= msk[..., 0]).all()
        assert msk[..., 2].sum() == 0
        # disc blob sits at the crop center
        cx, cy = np.argwhere(msk[..., 0] == 255).mean(0)
        assert abs(cx - 64) <= 2 and abs(cy - 64) <= 2


def test_clamping_at_border(tmp_path):
    from segtran_tpu.cli.prep_fundus import main as prep_main
    img_dir, mask_dir, _ = _make_raw(tmp_path, n=1, size=(200, 210),
                                     disc=(20, 15), r_disc=12, r_cup=5)
    out = str(tmp_path / "ds")
    (fname,) = prep_main(["--images", img_dir, "--masks", mask_dir,
                          "--out", out, "--roi", "128"])
    x0, y0 = (int(v) for v in fname[:-4].split("_")[2].split(","))
    assert (x0, y0) == (0, 0)   # clamped to the frame corner
    img = np.asarray(Image.open(os.path.join(out, "images", fname)))
    assert img.shape == (128, 128, 3)


def test_center_mode_without_masks(tmp_path):
    from segtran_tpu.cli.prep_fundus import main as prep_main
    img_dir, _, _ = _make_raw(tmp_path, n=1)
    out = str(tmp_path / "ds")
    (fname,) = prep_main(["--images", img_dir, "--out", out,
                          "--roi", "128", "--detsize", "256"])
    x0, y0 = (int(v) for v in fname[:-4].split("_")[2].split(","))
    assert (x0, y0) == (64, 64)   # centered crop of the 256-resized frame
    assert not os.path.isdir(os.path.join(out, "masks"))


def test_crops_train_e2e(tmp_path):
    """The emitted dataset is directly consumable by cli/train2d.py."""
    from segtran_tpu.cli.prep_fundus import main as prep_main
    from segtran_tpu.cli.train2d import main as train_main
    img_dir, mask_dir, _ = _make_raw(tmp_path)
    root = tmp_path / "data"
    out = str(root / "fundus" / "train")
    prep_main(["--images", img_dir, "--masks", mask_dir,
               "--out", out, "--roi", "128"])
    ckpt = str(tmp_path / "model")
    train_main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "1", "--attractors", "8",
        "--maxiter", "2", "--saveiter", "2", "--bs", "2",
        "--origsize", "128", "--patchsize", "64",
        "--dataroot", str(root), "--ckptdir", ckpt, "--ndevices", "1",
    ])
    job_dirs = [d for d in os.listdir(ckpt)
                if os.path.isdir(os.path.join(ckpt, d))]
    assert job_dirs, "no job dir created"
    inner = os.path.join(ckpt, job_dirs[0])
    assert any(d.startswith("iter_") for d in os.listdir(inner))

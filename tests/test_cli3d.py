"""3D train/eval CLI smoke tests on synthetic BraTS-like h5 volumes."""
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def make_brats_fixture(root, n=2, shape=(64, 64, 24)):
    ds_dir = os.path.join(root, "brats", "2019train")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"case{i}"
        img = rng.rand(4, *shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[20:40, 20:40, 8:16] = 2
        lab[25:35, 25:35, 10:14] = 1
        lab[28:32, 28:32, 11:13] = 4  # raw BraTS ET label (remapped to 3)
        with h5py.File(os.path.join(ds_dir, name + ".h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        names.append(name)
    for split in ("train", "all"):
        with open(os.path.join(ds_dir, f"{split}.list"), "w") as f:
            f.write("\n".join(names))
    return ds_dir


def test_train3d_and_test3d_cli(tmp_path):
    root = str(tmp_path / "data")
    make_brats_fixture(root)

    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--maxiter", "2", "--saveiter", "2", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--randscale", "0.1",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

    from segtran_tpu.cli.test3d import main as test_main
    results = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "2",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--bs", "4", "--outdir", str(tmp_path / "preds"),
        "--dataroot", root,
    ])
    dice = results[2]
    assert len(dice) == 3 and all(np.isfinite(dice))
    assert os.path.isfile(os.path.join(str(tmp_path / "preds"), "pred.tar"))

    # whole-volume (no sliding window) mode on the same checkpoint
    results_wv = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "2",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--wholevol", "--dataroot", root,
    ])
    assert all(np.isfinite(results_wv[2]))


def make_atria_fixture(root, n=1, shape=(48, 48, 16)):
    ds_dir = os.path.join(root, "atria", "2018train")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    names = []
    for i in range(n):
        name = f"atrium{i}"
        img = rng.rand(1, *shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[16:32, 16:32, 4:12] = 1
        with h5py.File(os.path.join(ds_dir, name + ".h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        names.append(name)
    for split in ("train", "all"):
        with open(os.path.join(ds_dir, f"{split}.list"), "w") as f:
            f.write("\n".join(names))
    return ds_dir


def test_atria_train_and_eval(tmp_path):
    """Atria task: single-modality, binarized labels (reference AtriaSet)."""
    root = str(tmp_path / "data")
    make_atria_fixture(root)
    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "atria", "--ds", "2018train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))
    from segtran_tpu.cli.test3d import main as test_main
    results = test_main([
        "--task", "atria", "--ds", "2018train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root,
    ])
    assert all(np.isfinite(results[1]))

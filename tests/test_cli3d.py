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


def make_msd_fixture(root, n=4, shape=(48, 48, 16), modalities=2):
    """Decathlon-style task dir: dataset.json + h5 volumes, NO list files
    (MSDSet must create them from dataset.json, reference :294-329)."""
    import json
    ds_dir = os.path.join(root, "msd", "Task05_Prostate")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.RandomState(2)
    training = []
    for i in range(n):
        name = f"prostate_{i:02d}"
        # nibabel layout: modality-LAST [H, W, D, C]
        img = rng.rand(*shape, modalities).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[16:32, 16:32, 4:12] = 1
        lab[20:28, 20:28, 6:10] = 2
        with h5py.File(os.path.join(ds_dir, name + ".h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        training.append({"image": f"./imagesTr/{name}.nii.gz",
                         "label": f"./labelsTr/{name}.nii.gz"})
    with open(os.path.join(ds_dir, "dataset.json"), "w") as f:
        json.dump({"numTraining": n, "training": training}, f)
    return ds_dir


def test_msd_train_and_eval(tmp_path):
    """MSD task end-to-end: dataset.json split creation, modality probing,
    --mod / --xyzpermute knobs (reference train3d.py:260-262,
    datasets3d.py:210-329)."""
    root = str(tmp_path / "data")
    ds_dir = make_msd_fixture(root)

    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "msd", "--ds", "Task05_Prostate", "--split", "train",
        "--translayers", "1", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))
    # list files were created from dataset.json (85/15 split of 4 -> 3/1)
    for split in ("train", "test", "all"):
        assert os.path.isfile(os.path.join(ds_dir, f"{split}.list")), split
    assert len(open(os.path.join(ds_dir, "train.list")).read().split()) == 3
    # modality count was probed from the h5 (2 modalities)
    log = open(os.path.join(ckpt_dir, "log.txt")).read()
    assert "orig_in_channels probed: 2" in log

    from segtran_tpu.cli.test3d import main as test_main
    results = test_main([
        "--task", "msd", "--ds", "Task05_Prostate", "--split", "test",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root,
    ])
    assert len(results[1]) == 2 and all(np.isfinite(results[1]))


def test_msd_chosen_modality_and_permute(tmp_path):
    """--mod selects one channel (model takes 1 input channel) and
    --xyzpermute permutes the volume axes (reference datasets3d.py:275-276,
    :410-413)."""
    root = str(tmp_path / "data")
    make_msd_fixture(root, shape=(48, 16, 48))

    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "msd", "--ds", "Task05_Prostate", "--split", "all",
        "--mod", "1", "--xyzpermute", "0,2,1",
        "--translayers", "1", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))
    log = open(os.path.join(ckpt_dir, "log.txt")).read()
    assert "orig_in_channels probed: 1" in log


def test_train3d_conv_depth_unpool(tmp_path):
    """--upd conv --dpool 2 (reference train3d.py:138,164): the channel-fold
    depth unpool trains and evaluates end-to-end; the eval path runs the
    factored fold+head composition (nn/heads.compose_fold_head)."""
    root = str(tmp_path / "data")
    make_brats_fixture(root)

    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--upd", "conv", "--dpool", "2",
        "--maxiter", "2", "--saveiter", "2", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_2"))

    from segtran_tpu.cli.test3d import main as test_main
    results = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--upd", "conv", "--dpool", "2",
        "--cpdir", ckpt_dir, "--iters", "2",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--bs", "4", "--dataroot", root,
    ])
    dice = results[2]
    assert len(dice) == 3 and all(np.isfinite(dice))

"""Round-2 tool exposure: test2d --savefeat / --removefrag, train3d
--attnconsist, test3d --testinterp (reference test2d.py:136,161,
train3d.py:115-117,426-449, test_util3d.py:48-60)."""
import os
import shutil

import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"
h5py = pytest.importorskip("h5py")


def test_attn_consistency_3d_matches_torch_oracle():
    """attention_consistency_loss_3d vs the reference formula
    (train3d.py:426-449) re-expressed in torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp
    from segtran_tpu.train.da import attention_consistency_loss_3d

    rng = np.random.RandomState(0)
    B, H, W, D, C = 2, 8, 8, 4, 3
    d2, h2, w2 = 2, 4, 4
    N = d2 * h2 * w2
    mask = (rng.rand(B, H, W, D, C) > 0.5).astype(np.float32)
    scores = rng.randn(B, 1, N, N).astype(np.float32)

    # reference math: mask [B,C,D,H,W] -> trilinear to (d2,h2,w2) -> flat
    m_t = torch.tensor(mask).permute(0, 4, 3, 1, 2)
    resized = F.interpolate(m_t, size=(d2, h2, w2), mode="trilinear",
                            align_corners=False)
    flat = resized.reshape(B, C, -1)
    consist = torch.clip(torch.matmul(flat.transpose(-2, -1), flat), 0, 1)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(scores).squeeze(1), consist).item()

    ours = attention_consistency_loss_3d(
        [jnp.asarray(scores)], jnp.asarray(mask), (d2, h2, w2),
        depth_first=True)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def _brats_fixture(root, n=1, shape=(48, 48, 16)):
    ds_dir = os.path.join(root, "brats", "2019train")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"case{i}"
        img = rng.rand(4, *shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[20:40, 20:40, 4:12] = 2
        lab[25:35, 25:35, 6:10] = 1
        with h5py.File(os.path.join(ds_dir, name + ".h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        names.append(name)
    for split in ("train", "all"):
        with open(os.path.join(ds_dir, f"{split}.list"), "w") as f:
            f.write("\n".join(names))
    return ds_dir


def test_train3d_attnconsist_and_test3d_testinterp(tmp_path):
    root = str(tmp_path / "data")
    _brats_fixture(root)

    from segtran_tpu.cli.train3d import main as train_main
    ckpt_dir = train_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8", "--attnconsist",
        "--maxiter", "1", "--saveiter", "1", "--bs", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--dataroot", root, "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "iter_1"))

    # --testinterp: GT down/up-sampling floor, no model inference
    from segtran_tpu.cli.test3d import main as test_main
    results = test_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "1",
        "--patchsize", "48,48,16", "--inputsize", "48,48,16",
        "--testinterp", "0.5", "--dataroot", root,
    ])
    dice = results[1]
    # a 2x down/up-sampled GT must still overlap the GT very well
    assert all(np.isfinite(dice)) and np.mean(dice) > 0.7, dice


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_test2d_savefeat_and_removefrag(tmp_path):
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main as train_main
    ckpt_dir = train_main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--maxiter", "1", "--saveiter", "1", "--bs", "2",
        "--origsize", "64", "--patchsize", "64", "--attractors", "8",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])

    from segtran_tpu.cli.test2d import main as eval_main
    outdir = tmp_path / "preds"
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "unet-scratch", "--attractors", "8",
        "--cpdir", ckpt_dir, "--iters", "1",
        "--origsize", "64", "--patchsize", "64",
        "--savefeat", "2", "--removefrag",
        "--outdir", str(outdir), "--dataroot", str(data_root), "--bs", "2",
    ])
    assert all(np.isfinite(results[1]))
    fpath = outdir / "pixel_features.npz"
    assert fpath.is_file(), "feature dump missing"
    data = np.load(fpath)
    assert data["features"].ndim == 2 and len(data["features"]) > 0
    assert len(data["features"]) == len(data["labels"])
    # the dump feeds the t-SNE tool directly
    from segtran_tpu.tools.analysis import tsne_features
    emb, labels = tsne_features(str(fpath))
    assert emb.shape[1] == 2 and len(emb) == len(labels)


def test_test2d_vis_rf(tmp_path):
    """--vis rf: per-layer gradient ERF maps (reference test2d.py:144-148,
    internal_util.py:21-58) saved as rf_*.png + rf_maps.npz."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()

    from segtran_tpu.cli.train2d import main as train_main
    ckpt_dir = train_main([
        "--task", "fundus", "--split", "all", "--net", "segtran",
        "--bb", "eff-b0", "--translayers", "2", "--attractors", "8",
        "--maxiter", "1", "--saveiter", "1", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])

    from segtran_tpu.cli.test2d import main as eval_main
    outdir = tmp_path / "vis"
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "segtran", "--bb", "eff-b0", "--translayers", "2",
        "--attractors", "8", "--cpdir", ckpt_dir, "--iters", "1",
        "--origsize", "64", "--patchsize", "64",
        "--vis", "rf", "--outdir", str(outdir),
        "--dataroot", str(data_root),
    ])
    maps = results[1]
    # reference feature_maps order: in-FPN output, then one map per
    # transformer layer (segtran2d.py:316-409)
    assert set(maps) == {"in_fpn", "layer_0", "layer_1"}
    for name, m in maps.items():
        assert m.shape == (64, 64) and np.isfinite(m).all() and m.max() > 0
        assert (outdir / f"rf_{name}.png").is_file()
    assert (outdir / "rf_maps.npz").is_file()
    # vislayers subset selects by index
    sub = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--net", "segtran", "--bb", "eff-b0", "--translayers", "2",
        "--attractors", "8", "--cpdir", ckpt_dir, "--iters", "1",
        "--origsize", "64", "--patchsize", "64",
        "--vis", "rf", "--vislayers", "0", "--outdir", str(outdir),
        "--dataroot", str(data_root),
    ])[1]
    assert set(sub) == {"in_fpn"}


def test_reshape_mask_probe(tmp_path):
    """--reshape rectangle: the value-255 region of channel 0 becomes its
    min-area rectangle at load (reference datasets2d.py:253-270; its test2d
    transform wiring is commented out upstream, test2d.py:377-381)."""
    import cv2  # noqa: F401  (probe requires cv2; skip-free, baked in)
    from segtran_tpu.data.datasets2d import SegCrop, reshape_mask

    # unit: an L-shaped 255 region becomes its filled bounding rectangle
    m = np.zeros((20, 20, 1), np.uint8)
    m[2:12, 2:5, 0] = 255
    m[2:5, 2:12, 0] = 255
    out = reshape_mask(m, 0, 255, shape="rectangle")
    assert out[:, :, 0].sum() > m[:, :, 0].sum()      # filled rectangle
    assert set(np.unique(out[:, :, 0])) <= {0, 255}
    # empty region: unchanged
    empty = np.zeros((8, 8, 1), np.uint8)
    assert reshape_mask(empty, 0, 255, shape="rectangle").sum() == 0

    # dataset wiring: fundus fixture, background (255) rectangle-ized
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    shutil.copytree(FUNDUS_DIR, data_root / "fundus" / "train")
    for f in (data_root / "fundus" / "train").glob("*.list"):
        f.unlink()
    base = str(data_root / "fundus" / "train")
    plain = SegCrop(base_dir=base, split="all", out_size=(64, 64))
    probed = SegCrop(base_dir=base, split="all", out_size=(64, 64),
                     reshape_mask_type="rectangle")
    m0 = plain[0]["mask"]
    m1 = probed[0]["mask"]
    assert m1.shape == m0.shape
    assert (m1 == 255).sum() >= (m0 == 255).sum()

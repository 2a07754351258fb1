"""Data layer: datasets (using the reference's shipped 2-image sample data as
a read-only fixture), device-side augmentation, label maps, pipeline."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtran_tpu.data.augment import (Aug2dConfig, augment_batch_2d,
                                      random_rot_flip_3d, random_noise_3d,
                                      random_resized_crop_3d)
from segtran_tpu.data.labelmaps import fundus_map_mask, harden_segmap
from segtran_tpu.data.labelmaps3d import (brats_map_label,
                                          make_brats_pred_consistent,
                                          brats_inv_map_label)
from segtran_tpu.data.pipeline import batch_iterator, epoch_indices

FUNDUS_DIR = "/root/reference/data/fundus/train"


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_segcrop_loads_sample_data(tmp_path):
    import shutil
    from segtran_tpu.data.datasets2d import SegCrop
    # copy the 2-image smoke fixture so list files are created in tmp
    base = tmp_path / "train"
    shutil.copytree(FUNDUS_DIR, base)
    for f in base.glob("*.list"):
        f.unlink()
    ds = SegCrop(base_dir=str(base), split="all", out_size=(576, 576),
                 uncropped_size=(2056, 2124))
    assert len(ds) >= 1
    s = ds[0]
    assert s["image"].shape == (576, 576, 3)
    assert s["image"].dtype == np.float32
    assert s["mask"].shape[:2] == (576, 576)
    assert (s["crop_pos"] >= 0).all()
    nhot = fundus_map_mask(jnp.asarray(s["mask"]))
    assert nhot.shape == (576, 576, 3)
    # disc channel includes cup
    assert bool(jnp.all(nhot[..., 1] >= nhot[..., 2]))


def test_augment_2d_shapes_and_determinism():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 64, 64, 3) > 0.5).astype(np.float32))
    cfg = Aug2dConfig(randscale=0.1, mean=(0.4, 0.3, 0.2),
                      std=(0.2, 0.2, 0.2))
    key = jax.random.PRNGKey(7)
    a1, m1 = jax.jit(lambda k, i, m: augment_batch_2d(k, i, m, cfg))(
        key, imgs, masks)
    a2, m2 = jax.jit(lambda k, i, m: augment_batch_2d(k, i, m, cfg))(
        key, imgs, masks)
    assert a1.shape == imgs.shape and m1.shape == masks.shape
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))  # deterministic
    # mask stays n-hot-ish (values in {0,1} after geometric-only ops)
    assert set(np.unique(np.asarray(m1))) <= {0.0, 1.0}


def test_augment_affine():
    """--do_affine (reference train_util.py:42-49): shape-preserving, masks
    stay n-hot with zero fill outside, images sample via reflect (no black
    corners), and a pure rotation matches jnp.rot90 up to interpolation."""
    from segtran_tpu.data.augment import _rand_affine
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(48, 48, 3).astype(np.float32)) * 0.5 + 0.25
    msk = jnp.asarray((rng.rand(48, 48, 2) > 0.5).astype(np.float32))
    i2, m2 = _rand_affine(jax.random.PRNGKey(5), img, msk, 45.0, 16.0)
    assert i2.shape == img.shape and m2.shape == msk.shape
    assert set(np.unique(np.asarray(m2))) <= {0.0, 1.0}
    # reflect fill: every sampled pixel stays within the input value range
    assert float(jnp.min(i2)) >= float(jnp.min(img)) - 1e-5
    assert float(jnp.max(i2)) <= float(jnp.max(img)) + 1e-5
    # deterministic under a fixed key
    i3, _ = _rand_affine(jax.random.PRNGKey(5), img, msk, 45.0, 16.0)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(i3))
    # the batched entry accepts do_affine
    cfg = Aug2dConfig(do_affine=True, mean=(0.5,) * 3, std=(0.5,) * 3)
    a, m = jax.jit(lambda k, i, m: augment_batch_2d(k, i, m, cfg))(
        jax.random.PRNGKey(0), img[None], msk[None])
    assert a.shape == img[None].shape


def test_augment_rot90_nonsquare():
    """Non-square rot90 with imgaug's default keep_size=True (reference
    train_util.py:41): odd k rotates the [H,W] image to [W,H] then RESIZES
    back to [H,W] (bilinear image / nearest segmap), so no content is
    cropped and no zero padding appears."""
    from segtran_tpu.data.augment import _rot90_nonsquare
    from segtran_tpu.ops.resize import resize_linear
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(24, 40, 3).astype(np.float32))
    msk = jnp.asarray((rng.rand(24, 40, 1) > 0.5).astype(np.float32))
    for k in range(4):
        i2, m2 = _rot90_nonsquare(jax.random.PRNGKey(9), jnp.int32(k),
                                  img, msk)
        assert i2.shape == img.shape and m2.shape == msk.shape
    # k=2 is the plain rot180
    i180, _ = _rot90_nonsquare(jax.random.PRNGKey(9), jnp.int32(2), img, msk)
    np.testing.assert_allclose(np.asarray(i180),
                               np.asarray(jnp.rot90(img, 2, (0, 1))))
    # k=1: rotate to [40,24] then resize back to [24,40]
    i90, m90 = _rot90_nonsquare(jax.random.PRNGKey(9), jnp.int32(1), img, msk)
    full = jnp.rot90(img, 1, (0, 1))                   # [40, 24, 3]
    want = resize_linear(full[None], (24, 40))[0]
    np.testing.assert_allclose(np.asarray(i90), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # mask: every value comes from the rotated mask (nearest -- binary stays
    # binary, no interpolated grays, no zero-padded bands)
    assert set(np.unique(np.asarray(m90))) <= {0.0, 1.0}
    mfull = np.asarray(jnp.rot90(msk, 1, (0, 1)))
    ys = np.minimum(np.arange(24) * 40 // 24, 39)
    xs = np.minimum(np.arange(40) * 24 // 40, 23)
    np.testing.assert_array_equal(np.asarray(m90), mfull[ys][:, xs])
    # the whole augment pipeline runs for non-square inputs
    cfg = Aug2dConfig(rot90_prob=1.0, mean=(0.5,) * 3, std=(0.5,) * 3)
    a, m = jax.jit(lambda k, i, m: augment_batch_2d(k, i, m, cfg))(
        jax.random.PRNGKey(1), img[None], msk[None])
    assert a.shape == img[None].shape and m.shape == msk[None].shape


def test_augment_3d_ops():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(16, 16, 8, 4).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 4, (16, 16, 8)))
    i2, l2 = random_rot_flip_3d(jax.random.PRNGKey(0), img, lab)
    assert i2.shape == img.shape and l2.shape == lab.shape
    i3 = random_noise_3d(jax.random.PRNGKey(1), img)
    assert float(jnp.max(jnp.abs(i3 - img))) <= 0.2 + 1e-6
    imgs = img[None]
    masks = jax.nn.one_hot(lab, 4)[None]
    i4, m4 = random_resized_crop_3d(jax.random.PRNGKey(2), imgs, masks, 0.1)
    assert i4.shape == imgs.shape and m4.shape == masks.shape


def test_brats_label_maps():
    lab = jnp.asarray([[0, 1], [2, 3]])
    nhot = brats_map_label(lab)
    np.testing.assert_array_equal(np.asarray(nhot[..., 0]),
                                  [[1, 0], [0, 0]])   # bg
    np.testing.assert_array_equal(np.asarray(nhot[..., 1]),
                                  [[0, 0], [0, 1]])   # ET = label 3
    np.testing.assert_array_equal(np.asarray(nhot[..., 2]),
                                  [[0, 1], [1, 1]])   # WT = 1|2|3
    np.testing.assert_array_equal(np.asarray(nhot[..., 3]),
                                  [[0, 1], [0, 1]])   # TC = 1|3
    # consistency: WT >= TC >= ET after max-fix
    probs = jnp.asarray([0.1, 0.9, 0.2, 0.3])[None, None, :]
    fixed = make_brats_pred_consistent(probs)
    assert float(fixed[..., 2].squeeze()) >= float(fixed[..., 3].squeeze()) \
        >= float(fixed[..., 1].squeeze()) - 1e-6
    inv = brats_inv_map_label(brats_map_label(lab))
    # argmax of inv probs recovers the raw labels
    np.testing.assert_array_equal(np.asarray(jnp.argmax(inv, -1)),
                                  np.asarray(lab))


def test_pipeline_batching():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"image": np.full((4, 4, 3), i, np.float32),
                    "mask": np.zeros((4, 4, 1), np.float32)}

    batches = list(batch_iterator(Toy(), 4, epoch=0, seed=3))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 4, 4, 3)
    # deterministic per-epoch shuffling
    i1 = epoch_indices(10, 5, seed=1)
    i2 = epoch_indices(10, 5, seed=1)
    np.testing.assert_array_equal(i1, i2)
    assert not np.array_equal(epoch_indices(10, 6, seed=1), i1)


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_gamma_label_csv_ingestion(tmp_path):
    """GAMMA image-level glaucoma labels (reference datasets2d.py:272-287):
    CSV is parsed into argmax labels and attached per sample (exact stem or
    leading-token match; -1 when unlisted)."""
    import shutil
    from segtran_tpu.data.datasets2d import SegCrop, load_gamma_labels
    base = tmp_path / "gamma-train"
    shutil.copytree(FUNDUS_DIR, base)
    for f in base.glob("*.list"):
        f.unlink()
    names = sorted(os.listdir(base / "images"))
    stem0 = os.path.splitext(names[0])[0].split("_")[0]
    csv_path = base / "glaucoma_label.csv"
    csv_path.write_text("data,non,early,mid_advanced\n"
                        f"{stem0},0,1,0\n"
                        "no_such_image,1,0,0\n")

    labels = load_gamma_labels(str(csv_path))
    assert labels[stem0] == 1 and labels["no_such_image"] == 0

    ds = SegCrop(base_dir=str(base), split="all", out_size=(64, 64))
    by_name = {os.path.basename(s["image_path"]): int(s["cls_label"])
               for s in (ds[i] for i in range(len(ds)))}
    assert by_name[names[0]] == 1
    # images without a CSV row get -1
    assert all(v == -1 for k, v in by_name.items() if k != names[0])

    # without any CSV the field is -1 everywhere
    csv_path.unlink()
    ds2 = SegCrop(base_dir=str(base), split="all", out_size=(64, 64))
    assert int(ds2[0]["cls_label"]) == -1

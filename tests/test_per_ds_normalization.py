"""Per-dataset normalization in multi-`--ds` and DA training (VERDICT r4 #2).

The reference builds one transform per ds_name with that dataset's own
(mean, std) (reference train_util.py:100-106), and the adversarial-DA source
loader gets the SOURCE dataset's transform (reference train2d.py:884-918).
Our concatenated device-side pipeline must therefore (a) tag every sample
with its dataset index, (b) look up per-sample stats inside the jitted step,
and (c) give the DA source batch the --sourceds stats, not the target's.
"""
import os
import shutil

import numpy as np
import pytest

FUNDUS_DIR = "/root/reference/data/fundus/train"


def _quiet_cfg():
    from segtran_tpu.data.augment import Aug2dConfig
    # every stochastic op off: the only thing left is (x - mean) / std
    return Aug2dConfig(randscale=0.0, fliplr_prob=0.0, flipud_prob=0.0,
                       rot90_prob=0.0, colorjitter=False, gray_alpha=0.0,
                       mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))


def test_augment_batch_per_sample_stats():
    """[B, C] mean/std overrides normalize each sample with its own row."""
    import jax
    import jax.numpy as jnp
    from segtran_tpu.data.augment import augment_batch_2d

    cfg = _quiet_cfg()
    imgs = jnp.stack([jnp.full((8, 8, 3), 0.6), jnp.full((8, 8, 3), 0.6)])
    masks = jnp.zeros((2, 8, 8, 1))
    mean = np.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], np.float32)
    std = np.asarray([[0.5, 0.5, 0.5], [0.1, 0.2, 0.4]], np.float32)
    out, _ = augment_batch_2d(jax.random.PRNGKey(0), imgs, masks, cfg,
                              mean, std)
    want0 = (0.6 - mean[0]) / std[0]
    want1 = (0.6 - mean[1]) / std[1]
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, 0, 0]), want1, atol=1e-6)

    # [C] single-table override (the DA source batch path) applies one table
    # to the whole batch, and differs from cfg's baked-in stats
    out_c, _ = augment_batch_2d(jax.random.PRNGKey(0), imgs, masks, cfg,
                                mean[1], std[1])
    np.testing.assert_allclose(np.asarray(out_c[0, 0, 0]), want1, atol=1e-6)
    out_cfg, _ = augment_batch_2d(jax.random.PRNGKey(0), imgs, masks, cfg)
    np.testing.assert_allclose(np.asarray(out_cfg[0, 0, 0]),
                               (0.6 - 0.5) / 0.25, atol=1e-6)


def test_concat_dataset_tags_ds_idx_and_pipeline_keeps_it():
    """ConcatDataset stamps ds_idx; batch_iterator stacks it when asked."""
    from segtran_tpu.data.datasets2d import ConcatDataset
    from segtran_tpu.data.pipeline import batch_iterator

    class Fake:
        def __init__(self, n, val):
            self.n, self.val = n, val

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"image": np.full((4, 4, 3), self.val, np.float32),
                    "mask": np.zeros((4, 4, 1), np.float32)}

    ds = ConcatDataset([Fake(3, 0.25), Fake(2, 0.75)])
    assert ds[0]["ds_idx"] == 0 and ds[3]["ds_idx"] == 1 and len(ds) == 5
    batch = next(batch_iterator(ds, 5, epoch=0, shuffle=False,
                                keys=("image", "mask", "ds_idx")))
    assert batch["ds_idx"].shape == (5,)
    # ds_idx rides with the sample's content: val 0.25 <-> idx 0
    vals = batch["image"][:, 0, 0, 0]
    np.testing.assert_array_equal(batch["ds_idx"],
                                  (vals > 0.5).astype(np.int32))


def _spy_make_full_step(monkeypatch, captured):
    import segtran_tpu.cli.train2d as t2d
    real = t2d.make_full_step

    def spy(*a, **kw):
        captured["ds_stats"] = kw.get("ds_stats")
        captured["src_stats"] = kw.get("src_stats")
        step = real(*a, **kw)

        def wrapped(state, batch):
            captured.setdefault("batch_keys", sorted(batch.keys()))
            return step(state, batch)

        return wrapped

    monkeypatch.setattr(t2d, "make_full_step", spy)


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_multi_ds_run_uses_each_datasets_own_stats(tmp_path, monkeypatch):
    """`--ds train,rim`: the step gets a [2, C] stats table whose rows are
    train's and rim's own entries, and batches carry ds_idx."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    for d in ("train", "rim"):
        shutil.copytree(FUNDUS_DIR, data_root / "fundus" / d)
        for f in (data_root / "fundus" / d).glob("*.list"):
            f.unlink()

    captured = {}
    _spy_make_full_step(monkeypatch, captured)
    from segtran_tpu.cli.train2d import load_stats, main
    main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--ds", "train,rim",
        "--maxiter", "1", "--saveiter", "10", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    import argparse
    args = argparse.Namespace(task_name="fundus", gray_alpha=0.5,
                              stats_json=None)
    want_train = load_stats(args, "train")
    want_rim = load_stats(args, "rim")
    assert want_train != want_rim  # the table rows genuinely differ
    ds_stats = captured["ds_stats"]
    assert ds_stats is not None
    np.testing.assert_allclose(ds_stats[0][0], want_train[0], atol=1e-6)
    np.testing.assert_allclose(ds_stats[1][0], want_train[1], atol=1e-6)
    np.testing.assert_allclose(ds_stats[0][1], want_rim[0], atol=1e-6)
    np.testing.assert_allclose(ds_stats[1][1], want_rim[1], atol=1e-6)
    assert "ds_idx" in captured["batch_keys"]


@pytest.mark.skipif(not os.path.isdir(FUNDUS_DIR),
                    reason="sample data not available")
def test_da_source_batch_uses_sourceds_stats(tmp_path, monkeypatch):
    """`--ds rim --sourceds train --adv feat`: the source batch normalizes
    with train's stats while the target run uses rim's."""
    data_root = tmp_path / "data"
    (data_root / "fundus").mkdir(parents=True)
    for d in ("train", "rim"):
        shutil.copytree(FUNDUS_DIR, data_root / "fundus" / d)
        for f in (data_root / "fundus" / d).glob("*.list"):
            f.unlink()

    captured = {}
    _spy_make_full_step(monkeypatch, captured)
    from segtran_tpu.cli.train2d import load_stats, main
    main([
        "--task", "fundus", "--split", "all", "--net", "unet-scratch",
        "--ds", "rim", "--adv", "feat", "--sourceds", "train",
        "--maxiter", "1", "--saveiter", "10", "--bs", "2",
        "--origsize", "64", "--patchsize", "64",
        "--dataroot", str(data_root), "--ckptdir", str(tmp_path / "model"),
        "--ndevices", "1",
    ])
    import argparse
    args = argparse.Namespace(task_name="fundus", gray_alpha=0.5,
                              stats_json=None)
    src = captured["src_stats"]
    assert src is not None
    np.testing.assert_allclose(src[0], load_stats(args, "train")[0],
                               atol=1e-6)
    assert tuple(np.round(src[0], 6)) != tuple(
        np.round(load_stats(args, "rim")[0], 6))
    # single target ds: no per-sample table needed
    assert captured["ds_stats"] is None

"""Regression + oracle-parity tests for round-1 review findings:

* attention_consistency_loss vs the reference's attn_consist_loss_fun
  (train2d.py:668-723), extracted and exec'd as a torch oracle,
* fundus/polyp label maps on [..., H, W, 1] single-channel masks
  (datasets2d always appends a channel dim to grayscale masks),
* BratsSet raw-label handling (4 -> 3 remap, binarize),
* prefetch_to_device exception propagation,
* random_resized_crop_3d trilinear image resampling.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_TRAIN2D = "/root/reference/code/train2d.py"


def _extract_reference_attnconsist():
    """Exec just attn_consist_loss_fun out of the reference's train2d.py
    (importing the module pulls in dataloaders/imgaug; the function itself
    only needs torch)."""
    torch = pytest.importorskip("torch")
    with open(REF_TRAIN2D) as f:
        src = f.read()
    start = src.index("def attn_consist_loss_fun")
    end = src.index("\nif __name__", start)
    ns = {"torch": torch, "F": torch.nn.functional}
    exec(compile(src[start:end], REF_TRAIN2D, "exec"), ns)
    return ns["attn_consist_loss_fun"], torch


@pytest.mark.skipif(not os.path.isfile(REF_TRAIN2D),
                    reason="reference repo not available")
@pytest.mark.parametrize("squeezed,scale", [(False, 1.0), (True, 1.0),
                                            (False, 100.0)])
def test_attn_consist_loss_parity(squeezed, scale):
    """Includes the .bool() consistency semantics (any positive soft-mask dot
    product) and the cap-at-1 path (scale=100 forces loss > 1)."""
    from segtran_tpu.train.da import attention_consistency_loss
    ref_fn, torch = _extract_reference_attnconsist()
    rng = np.random.RandomState(42)
    b, h2, w2, c, a = 2, 4, 4, 3, 5
    n = h2 * w2
    # soft mask with many tiny positive overlaps (exercises bool() vs >0.5)
    mask = rng.rand(b, 8, 8, c).astype(np.float32) * 0.4
    if squeezed:
        in_s = rng.randn(b, 1, a, n).astype(np.float32) * scale
        out_s = rng.randn(b, 1, n, a).astype(np.float32) * scale
        ours_scores = [(jnp.asarray(in_s), jnp.asarray(out_s))]
        ref_scores = [[torch.tensor(in_s), torch.tensor(out_s)]]
    else:
        s = rng.randn(b, 1, n, n).astype(np.float32) * scale
        ours_scores = [jnp.asarray(s)]
        ref_scores = [torch.tensor(s)]
    ours = attention_consistency_loss(ours_scores, jnp.asarray(mask),
                                      (h2, w2))
    ref = ref_fn(ref_scores, (h2, w2),
                 torch.tensor(mask).permute(0, 3, 1, 2))
    assert np.allclose(float(ours), float(ref), rtol=2e-4, atol=1e-5), \
        (float(ours), float(ref))


def test_fundus_map_mask_singleton_channel():
    """REFUGE official annotations are single-channel 255/128/0; datasets2d
    emits them as [H, W, 1] and batches as [B, H, W, 1]."""
    from segtran_tpu.data.labelmaps import fundus_map_mask
    raw = np.full((2, 6, 6, 1), 255, np.uint8)
    raw[:, 1:5, 1:5] = 128   # disc
    raw[:, 2:4, 2:4] = 0     # cup
    nhot = np.asarray(fundus_map_mask(jnp.asarray(raw)))
    assert nhot.shape == (2, 6, 6, 3)
    assert nhot[0, 0, 0].tolist() == [1, 0, 0]
    assert nhot[0, 1, 1].tolist() == [0, 1, 0]
    # disc channel includes cup (non-exclusive)
    assert nhot[0, 3, 3].tolist() == [0, 1, 1]
    # rank-2 raw input still accepted
    assert np.asarray(fundus_map_mask(jnp.asarray(raw[0, ..., 0]))
                      ).shape == (6, 6, 3)


def test_polyp_map_mask_singleton_channel():
    from segtran_tpu.data.labelmaps import polyp_map_mask
    raw = np.zeros((2, 6, 6, 1), np.uint8)
    raw[:, 2:4, 2:4] = 255
    nhot = np.asarray(polyp_map_mask(jnp.asarray(raw)))
    assert nhot.shape == (2, 6, 6, 2)
    assert nhot[0, 0, 0].tolist() == [1, 0]
    assert nhot[0, 2, 2].tolist() == [0, 1]


def test_brats_raw_label_remap(tmp_path):
    """Raw BraTS h5 labels {0,1,2,4}: label 4 (ET) must reach the model as 3
    (reference datasets3d.py:403-404); binarize collapses to {0,1}."""
    h5py = pytest.importorskip("h5py")
    from segtran_tpu.data.datasets3d import BratsSet
    lab = np.zeros((8, 8, 4), np.uint8)
    lab[2:6, 2:6, 1:3] = 2
    lab[3:5, 3:5, 1:3] = 4
    with h5py.File(tmp_path / "case0.h5", "w") as f:
        f.create_dataset("image", data=np.zeros((4, 8, 8, 4), np.float32))
        f.create_dataset("label", data=lab)
    (tmp_path / "all.list").write_text("case0\n")
    ds = BratsSet(base_dir=str(tmp_path), split="all", mode="test")
    got = ds[0]["label"]
    assert set(np.unique(got)) == {0, 2, 3}
    assert (got == 3).sum() == (lab == 4).sum()
    ds_bin = BratsSet(base_dir=str(tmp_path), split="all", mode="test",
                      binarize=True)
    assert set(np.unique(ds_bin[0]["label"])) == {0, 1}


def test_prefetch_propagates_producer_errors():
    from segtran_tpu.data.pipeline import prefetch_to_device

    def bad_iter():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("corrupt sample")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        next(it)


def test_random_resized_crop_3d_trilinear():
    """Images must be linearly interpolated (a linear ramp stays exact at
    valid coordinates); masks stay nearest-neighbor."""
    from segtran_tpu.data.augment import random_resized_crop_3d
    h = w = d = 8
    key = jax.random.PRNGKey(0)
    scale = 0.3
    ramp = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None, None],
                            (h, w, d))[None, ..., None]
    mask = (ramp >= 4).astype(jnp.float32)
    out_img, out_mask = random_resized_crop_3d(key, ramp, mask, scale)
    # replicate the zoom factor + coordinate grid of the implementation
    f = jax.random.uniform(key, (), minval=1.0 - scale, maxval=1.0 + scale)
    coords = (jnp.arange(h) - (h - 1) / 2.0) * f + (h - 1) / 2.0
    valid = (coords >= -0.5) & (coords <= h - 0.5)
    # row (x=0, z=0) is additionally zeroed when coord 0 falls out of range
    expect = jnp.clip(coords, 0, h - 1) * valid * valid[0]
    got = out_img[0, :, 0, 0, 0]
    assert float(jnp.max(jnp.abs(got - expect))) < 1e-5, (got, expect)
    assert set(np.unique(np.asarray(out_mask))) <= {0.0, 1.0}

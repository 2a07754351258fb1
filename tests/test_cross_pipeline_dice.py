"""Cross-pipeline Dice parity: the REFERENCE torch eval pipeline vs OURS.

The strongest available surrogate for the released-weights north star: build a
random-weight reference Segtran2d, save it as a reference-format .pth, then

  * run the reference's own eval chain (dataloaders.datasets2d.SegCrop ->
    test_util2d.test_all_cases: sliding window, hardening, per-class Dice,
    vCDR error; reference test2d.py:520-750 wiring) on the 2-image fundus
    fixture, torch CPU;
  * convert the .pth with our converter and run our cli/test2d.py main() on
    the same fixture with the same recipe;

and assert the per-class Dice + vCDR error agree to <=1e-4. This validates
converter + sliding-window + hardening + metric + mask-mapping as one chain
across the two pipelines, so a released-blob run is a formality.

The reference eval imports imgaug/torchvision which this container lacks; at
test time its aug pipeline is iaa.Resize(576)+Grayscale(alpha) which is the
IDENTITY here (fixture images are already 576x576; we pass --gray 0), so the
stubs below only need to satisfy the imports, and common_aug_func=None is
faithful. cuda calls are shimmed to CPU.
"""
import json
import os
import shutil
import sys
import types
from functools import partial

import numpy as np
import pytest

REF = "/root/reference/code"
FIXTURE = "/root/reference/data/fundus/train"
pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and os.path.isdir(FIXTURE)),
    reason="reference repo not available")

torch = pytest.importorskip("torch")


def _stub_modules():
    """Satisfy module-level imports the reference files make (imgaug,
    torchvision) with minimal fakes; none of the stubbed machinery runs in
    this test's identity-transform configuration."""
    if "imgaug" not in sys.modules:
        ia = types.ModuleType("imgaug")
        iaa = types.ModuleType("imgaug.augmenters")
        segmaps = types.ModuleType("imgaug.augmentables.segmaps")
        augmentables = types.ModuleType("imgaug.augmentables")
        segmaps.SegmentationMapsOnImage = None
        augmentables.segmaps = segmaps
        ia.augmenters = iaa
        ia.augmentables = augmentables
        sys.modules["imgaug"] = ia
        sys.modules["imgaug.augmenters"] = iaa
        sys.modules["imgaug.augmentables"] = augmentables
        sys.modules["imgaug.augmentables.segmaps"] = segmaps
    if "torchvision" not in sys.modules:
        class ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
                return t.float().div(255) if t.dtype == torch.uint8 \
                    else t.float()

        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        transforms.ToTensor = ToTensor
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms


def _cpu_shims(monkeypatch):
    """Route the reference's .cuda()/device='cuda' to CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    real_zeros = torch.zeros

    def zeros(*a, **k):
        if k.get("device") == "cuda":
            k["device"] = "cpu"
        return real_zeros(*a, **k)

    monkeypatch.setattr(torch, "zeros", zeros)


MEAN, STD = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)


def _image_trans(pic):
    arr = np.asarray(pic, np.float32).transpose(2, 0, 1) / 255.0
    mean = np.asarray(MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(STD, np.float32).reshape(3, 1, 1)
    return torch.from_numpy((arr - mean) / std)


def test_cross_pipeline_dice(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    _stub_modules()
    from tests.test_segtran2d_parity import build_reference_model

    # ---- fixture: 2 REFUGE crops at exactly 576x576 (identity resize) ----
    root = tmp_path / "data"
    ds_dir = root / "fundus" / "train"
    shutil.copytree(FIXTURE, ds_dir)
    for stale in ds_dir.glob("*.list"):   # stale lists; both pipelines
        stale.unlink()                    # regenerate from images/

    # ---- random-weight reference-format checkpoint ----
    torch.manual_seed(31)
    ref_model, _ = build_reference_model(
        backbone="eff-b4", translayers=2, compress=(1.0, 1.0, 2.0),
        num_classes=3, num_attractors=8)
    pth_path = str(tmp_path / "iter_100.pth")
    torch.save({
        "iter_num": 100,
        "model": ref_model.state_dict(),
        "args": {
            "backbone_type": "eff-b4", "num_classes": 3,
            "num_attractors": 8, "num_translayers": 2,
            "translayer_compress_ratios": [1.0, 1.0, 2.0],
            "in_fpn_layers": "34", "out_fpn_layers": "1234",
            "qk_have_bias": True, "tie_qk_scheme": "shared",
            "patch_size": (96, 96),
        },
    }, pth_path)

    # ---- reference eval pipeline (torch CPU) ----
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _cpu_shims(monkeypatch)
    from torch.utils.data import DataLoader
    import dataloaders.datasets2d as ref_ds
    from test_util2d import test_all_cases

    db_test = ref_ds.SegCrop(
        base_dir=str(ds_dir), split="all", mode="test",
        mask_num_classes=3, has_mask=True,
        common_aug_func=None,          # identity (see module docstring)
        image_trans_func=_image_trans,
        segmap_trans_func=None, binarize=False, train_loc_prob=0,
        chosen_size=576, uncropped_size=(2056, 2124))
    assert len(db_test) == 2
    loader = DataLoader(db_test, batch_size=2, shuffle=False, num_workers=0)

    ref_model.eval()
    with torch.no_grad():
        ref_metric, ref_count = test_all_cases(
            ref_model, loader, task_name="fundus", num_classes=3,
            model_type="segtran", orig_input_size=(576, 576),
            patch_size=(96, 96), stride=(288, 288),
            test_save_paths=None, out_origsize=False,
            mask_prepred_mapping_func=partial(ref_ds.fundus_map_mask,
                                              exclusive=False),
            mask_postpred_mapping_funcs=[ref_ds.fundus_inv_map_mask],
            reload_mask=False, test_interp=None, do_calc_vcdr_error=True)
    assert ref_count[0] == 2
    assert np.all(np.isfinite(ref_metric))

    # ---- our pipeline: convert the .pth, run cli/test2d.py ----
    from segtran_tpu.convert.cli import convert_pth
    conv_dir = str(tmp_path / "converted")
    convert_pth(pth_path, conv_dir, "segtran2d")

    # both pipelines must normalize identically: the torch side above uses
    # the fixed MEAN/STD, so pin ours via --stats (otherwise the CLI
    # auto-selects the built-in fundus gray-alpha table, data/stats.py)
    stats_path = str(tmp_path / "stats.json")
    with open(stats_path, "w") as f:
        json.dump({"mean": {"train": list(MEAN)},
                   "std": {"train": list(STD)}}, f)

    from segtran_tpu.cli.test2d import main as eval_main
    results = eval_main([
        "--task", "fundus", "--ds", "train", "--split", "all",
        "--dataroot", str(root), "--net", "segtran", "--bb", "eff-b4",
        "--translayers", "2", "--layercompress", "1,1,2",
        "--attractors", "8", "--cpdir", conv_dir, "--iters", "100",
        "--bs", "2", "--origsize", "576", "--patchsize", "96",
        "--gray", "0", "--vcdr", "--stats", stats_path,
    ])
    ours = np.asarray(results[100])
    print("reference metric:", ref_metric, " ours:", ours, flush=True)

    # [dice_disc, dice_cup, vcdr_error] in both layouts
    assert ours.shape == ref_metric.shape == (3,)
    np.testing.assert_allclose(ours, ref_metric, atol=1e-4, rtol=0)

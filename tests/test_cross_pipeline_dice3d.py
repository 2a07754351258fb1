"""3D cross-pipeline Dice parity: the REFERENCE torch eval chain vs OURS.

Same surrogate as the 2D test (test_cross_pipeline_dice.py) for the BraTS
path: build a random-weight reference Segtran3d, save a reference-format
.pth, then

  * run the reference eval chain (dataloaders.datasets3d.BratsSet ->
    test_util3d.test_all_cases: centered padding, 3D sliding window with
    stride=patch/2, additive prob blending, brats label consistency,
    per-class metrics; reference test3d.py:238-407 wiring) on 2 synthetic
    h5 volumes, torch CPU;
  * convert the .pth with our converter and run cli/test3d.py main() on the
    same volumes with the same recipe;

and assert the per-class Dice agree to <=1e-4 (the reference also reports
jc/asd; our CLI returns Dice, the primary metric, so the chain compares the
full converter + window grid + blending + harden + mapping path on it).

medpy/nibabel are not installed here: medpy.metric.binary is stubbed with
the exact dc formula (2|A^B|/(|A|+|B|), 0 on empty -- medpy binary.dc) and
jc/asd stubs the reference calls but whose columns we do not compare;
nibabel is only needed for save_result=True, which this test disables.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")


def _stub_medpy_nibabel():
    if "medpy" not in sys.modules:
        def dc(pred, gt):
            inter = np.count_nonzero(pred & gt)
            s = np.count_nonzero(pred) + np.count_nonzero(gt)
            return 2.0 * inter / s if s else 0.0

        def jc(pred, gt):
            inter = np.count_nonzero(pred & gt)
            union = np.count_nonzero(pred | gt)
            return inter / union if union else 0.0

        binary = types.ModuleType("medpy.metric.binary")
        binary.dc, binary.jc = dc, jc
        binary.asd = lambda *a, **k: 0.0
        binary.hd95 = lambda *a, **k: 0.0
        metric = types.ModuleType("medpy.metric")
        metric.binary = binary
        medpy = types.ModuleType("medpy")
        medpy.metric = metric
        sys.modules["medpy"] = medpy
        sys.modules["medpy.metric"] = metric
        sys.modules["medpy.metric.binary"] = binary
    if "nibabel" not in sys.modules:
        nib = types.ModuleType("nibabel")
        nib.save = lambda *a, **k: None
        nib.Nifti1Image = lambda *a, **k: None
        sys.modules["nibabel"] = nib


def make_fixture(root, n=2, shape=(128, 128, 24)):
    ds_dir = os.path.join(root, "brats", "2019train")
    os.makedirs(ds_dir, exist_ok=True)
    rng = np.random.RandomState(17)
    names = []
    for i in range(n):
        name = f"case{i}.h5"
        img = rng.rand(4, *shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[30 + i:90, 26:80, 6:18] = 2
        lab[40:70, 35:70, 9:15] = 1
        lab[48:60, 45:60, 10:13] = 4   # raw ET label (4 -> 3 at load)
        with h5py.File(os.path.join(ds_dir, name), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        names.append(name)
    for split in ("train", "test", "all"):
        with open(os.path.join(ds_dir, f"{split}.list"), "w") as f:
            f.write("\n".join(names))
    return ds_dir


def test_cross_pipeline_dice3d(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    _stub_medpy_nibabel()
    from tests.test_segtran3d_parity import (_import_reference_segtran3d,
                                             _CudaFreeTensor)
    from tests.test_cross_pipeline_dice import _cpu_shims

    root = str(tmp_path / "data")
    ds_dir = make_fixture(root)

    # ---- random-weight reference-format checkpoint ----
    ref = _import_reference_segtran3d()
    from argparse import Namespace
    torch.manual_seed(23)
    rcfg = ref.Segtran3dConfig()
    rcfg.use_pretrained = False
    rcfg.device = "cpu"
    rcfg.num_translayers = 1
    rcfg.num_attractors = 8
    rcfg.num_classes = 4
    rcfg.orig_in_channels = 4
    rcfg.hidden_dropout_prob = 0.0
    rcfg.attention_probs_dropout_prob = 0.0
    fpn = Namespace(in_fpn_layers="34", out_fpn_layers="1234",
                    in_fpn_scheme="AN", out_fpn_scheme="AN",
                    translayer_compress_ratios=[1, 1])
    rcfg.set_fpn_layers("test", fpn, do_print=False)
    ref_model = ref.Segtran3d(rcfg)
    ref_model.eval()

    pth_path = str(tmp_path / "iter_50.pth")
    torch.save({
        "iter_num": 50,
        "model": ref_model.state_dict(),
        "args": {
            "num_classes": 4, "num_attractors": 8, "num_translayers": 1,
            "translayer_compress_ratios": [1.0, 1.0],
            "in_fpn_layers": "34", "out_fpn_layers": "1234",
            "qk_have_bias": True, "tie_qk_scheme": "shared",
            "orig_in_channels": 4, "inchan_to3_scheme": "bridgeconv",
            "D_pool_K": 2, "out_fpn_upsampleD_scheme": "interp",
            "input_patch_size": (112, 112, 16),
        },
    }, pth_path)

    # ---- reference eval chain (torch CPU) ----
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _cpu_shims(monkeypatch)
    import dataloaders.datasets3d as ref_ds3
    from test_util3d import test_all_cases

    db_test = ref_ds3.BratsSet(
        base_dir=ds_dir, split="all", mode="test",
        transform=ref_ds3.ToTensor(), chosen_modality=-1,
        binarize=False, train_loc_prob=0,
        min_output_size=(112, 112, 16))
    assert len(db_test) == 2

    with _CudaFreeTensor(), torch.no_grad():
        ref_metric = test_all_cases(
            ref_model, db_test, task_name="brats", net_type="segtran",
            num_classes=4, batch_size=4,
            orig_patch_size=(112, 112, 16), input_patch_size=(112, 112, 16),
            stride_xy=56, stride_z=8,
            save_result=False, test_save_path=None,
            preproc_fn=None, test_interp=None, has_mask=True)
    ref_dice = np.asarray(ref_metric)[:, 0]     # [dice, jc, hd, asd] cols
    assert np.all(np.isfinite(ref_dice))

    # ---- our pipeline: convert the .pth, run cli/test3d.py ----
    from segtran_tpu.convert.cli import convert_pth
    conv_dir = str(tmp_path / "converted")
    convert_pth(pth_path, conv_dir, "segtran3d")

    from segtran_tpu.cli.test3d import main as eval_main
    results = eval_main([
        "--task", "brats", "--ds", "2019train", "--split", "all",
        "--translayers", "1", "--attractors", "8",
        "--cpdir", conv_dir, "--iters", "50",
        "--patchsize", "112,112,16", "--inputsize", "112,112,16",
        "--bs", "4", "--dataroot", root,
    ])
    ours = np.asarray(results[50])
    print("reference dice:", ref_dice, " ours:", ours, flush=True)
    assert ours.shape == ref_dice.shape == (3,)
    np.testing.assert_allclose(ours, ref_dice, atol=1e-4, rtol=0)

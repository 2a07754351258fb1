"""Tools: flops/fps, robustness eval, ERF, stats, postproc, preprocessing
normalization, smp-style UNet."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_count_params_and_flops():
    from segtran_tpu.tools.flops import count_params, estimate_flops
    from segtran_tpu.models.unet2d import VanillaUNet
    model = VanillaUNet(num_classes=2)
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    n = count_params(variables["params"])
    assert n > 1e6
    costs = estimate_flops(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)
    assert costs["flops"] > 1e8


def test_robustness_eval():
    from segtran_tpu.tools.robustness import eval_robustness
    from segtran_tpu.models.unet2d import VanillaUNet
    model = VanillaUNet(num_classes=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    res = eval_robustness(model, variables, x,
                          perturbations=("brightness", "noise"))
    assert "brightness" in res and "noise" in res
    assert -1.0 <= res["noise"]["output_pearson"] <= 1.0


def test_effective_receptive_field():
    from segtran_tpu.tools.analysis import effective_receptive_field
    from segtran_tpu.models.unet2d import VanillaUNet
    model = VanillaUNet(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    erf = effective_receptive_field(model, variables, (32, 32, 3))
    assert erf.shape == (32, 32)
    # center should receive gradient
    assert erf[16, 16] > 0


def test_dataset_stats(tmp_path):
    from segtran_tpu.tools.analysis import (compute_dataset_stats,
                                            write_stats_json)

    class Toy:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"image": rng.rand(8, 8, 3).astype(np.float32) * 0.5}

    stats = compute_dataset_stats(Toy())
    assert all(0.1 < m < 0.4 for m in stats["mean"])
    out = tmp_path / "stats.json"
    write_stats_json({"train": stats}, str(out))
    loaded = json.load(open(out))
    assert "mean" in loaded and "train" in loaded["mean"]


def test_remove_fragmentary_segs():
    from segtran_tpu.tools.postproc import remove_fragmentary_segs
    mask = np.zeros((20, 20), np.uint8)
    mask[1:8, 1:8] = 1      # large
    mask[12:17, 12:17] = 1  # medium
    mask[0, 19] = 1         # fragment
    out = remove_fragmentary_segs(mask, keep_top=2)
    assert out[3, 3] == 1 and out[14, 14] == 1 and out[0, 19] == 0


def test_normalize_nonzero():
    from segtran_tpu.data.preprocessing import normalize_nonzero
    rng = np.random.RandomState(0)
    img = rng.rand(2, 8, 8, 4).astype(np.float32) + 1.0
    img[:, :2] = 0.0
    out = normalize_nonzero(img)
    assert np.all(out[:, :2] == 0)  # zeros stay zero
    nz = out[0][img[0] > 0]
    assert abs(nz.mean()) < 1e-4


def test_unet_smp():
    from segtran_tpu.models.unet_smp import UnetSMP
    m = UnetSMP(num_classes=3, encoder="resnet18",
                decoder_channels=(64, 32, 16, 8, 8))
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_vcdr_csv_eval(tmp_path):
    from segtran_tpu.tools.analysis import vcdr_csv_eval
    (tmp_path / "pred.csv").write_text("a,0.5\nb,0.7\n")
    (tmp_path / "gt.csv").write_text("a,0.6\nb,0.7\nc,0.9\n")
    res = vcdr_csv_eval(str(tmp_path / "pred.csv"), str(tmp_path / "gt.csv"))
    assert res["n"] == 2
    np.testing.assert_allclose(res["mae"], 0.05, atol=1e-6)


def test_tsne_features(tmp_path):
    """--savefeat dump -> 2D t-SNE embedding (tools/analysis.py; reference
    tsne.py). Small synthetic blob features; sklearn path if installed,
    SVD fallback otherwise."""
    import numpy as np
    from segtran_tpu.tools.analysis import dump_pixel_features, tsne_features

    rng = np.random.RandomState(0)
    h = w = 16
    feat = rng.randn(h, w, 8).astype(np.float32)
    mask = (rng.rand(h, w) > 0.5).astype(np.int32)
    feat[mask == 1] += 4.0  # separable classes
    path = str(tmp_path / "feat.npz")
    dump_pixel_features(feat, mask, path, max_pixels=128, seed=0)

    emb, labels = tsne_features(path, perplexity=10.0, seed=0)
    assert emb.shape == (128, 2) and labels.shape == (128,)
    assert np.all(np.isfinite(emb))
    assert set(np.unique(labels)) <= {0, 1}


def test_surface_metrics_medpy_absent_nan(monkeypatch):
    """Without medpy, hd95/asd come back NaN (and the startup line says so)
    instead of crashing -- reference relies on medpy being installed
    (test_util3d.py:196-206)."""
    import builtins
    import logging
    import numpy as np
    from segtran_tpu.infer import metrics

    real_import = builtins.__import__

    def no_medpy(name, *a, **k):
        if name.startswith("medpy"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_medpy)
    assert not metrics.have_medpy()
    pred = np.zeros((8, 8, 8), np.uint8)
    pred[2:5, 2:5, 2:5] = 1
    gt = np.zeros_like(pred)
    gt[3:6, 3:6, 3:6] = 1
    hd95, asd = metrics.surface_metrics(pred, gt)
    assert np.isnan(hd95) and np.isnan(asd)

    records = []

    class Cap:
        def info(self, msg, *args):
            records.append(msg % args if args else msg)

    metrics.log_metric_stack(Cap())
    assert any("medpy not installed" in r for r in records)


def test_surface_metrics_empty_mask_nan():
    """Empty pred or gt -> (nan, nan) regardless of medpy availability."""
    import numpy as np
    from segtran_tpu.infer.metrics import surface_metrics

    pred = np.zeros((4, 4, 4), np.uint8)
    gt = np.ones((4, 4, 4), np.uint8)
    hd95, asd = surface_metrics(pred, gt)
    assert np.isnan(hd95) and np.isnan(asd)

"""Analysis tooling: t-SNE of per-pixel features, effective receptive fields,
dataset statistics, vCDR CSV evaluation.

Parity targets:
  * t-SNE of saved per-pixel features        -> reference code/tsne.py
  * receptive-field visualization            -> reference internal_util.py:21-58
    + code/receptivefield/ (gradient-based ERF; here one jax.grad call
    replaces the vendored 1222-LoC probe library)
  * dataset mean/std -> stats JSON           -> reference code/calcstat.py
  * vCDR CSV eval                            -> reference code/test-vcdr.py
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def dump_pixel_features(feat: np.ndarray, mask: np.ndarray, out_path: str,
                        max_pixels: int = 20000, seed: int = 0):
    """Save per-pixel (feature, label) pairs for t-SNE (the reference's
    --savefeat dump, test_util2d.py:78-88): feat [H, W, C], mask [H, W]."""
    f = feat.reshape(-1, feat.shape[-1])
    m = mask.reshape(-1)
    rng = np.random.RandomState(seed)
    if f.shape[0] > max_pixels:
        idx = rng.choice(f.shape[0], max_pixels, replace=False)
        f, m = f[idx], m[idx]
    np.savez_compressed(out_path, features=f.astype(np.float16), labels=m)


def tsne_features(npz_path: str, perplexity: float = 30.0, seed: int = 0):
    """2D t-SNE embedding of a feature dump; returns (embedding, labels)."""
    data = np.load(npz_path)
    feats, labels = data["features"].astype(np.float32), data["labels"]
    try:
        from sklearn.manifold import TSNE
        emb = TSNE(n_components=2, perplexity=perplexity,
                   random_state=seed).fit_transform(feats)
    except ImportError:
        from numpy.linalg import svd
        c = feats - feats.mean(0)
        u, s, _ = svd(c, full_matrices=False)
        emb = u[:, :2] * s[:2]
    return emb, labels


def hausdorff_matrix(npz_paths: Sequence[str], num_classes: int,
                     max_points_per_class: int = 2000, seed: int = 0,
                     feat_norm: bool = False) -> np.ndarray:
    """Cross-checkpoint class-wise average-Hausdorff distances (reference
    tsne.py:144-160): entry [i, ci, j, cj] is the symmetric avg-Hausdorff
    between checkpoint i's class-ci features and checkpoint j's class-cj
    features. npz_paths are --savefeat dumps (dump_pixel_features). With
    feat_norm, features are class-wise LayerNormed first (tsne.py:118-139)."""
    from ..train.contrast import avg_hausdorff_np, normalize_features_by_class
    rng = np.random.RandomState(seed)
    subsets = {}
    for i, p in enumerate(npz_paths):
        data = np.load(p)
        feats = data["features"].astype(np.float32)
        labels = np.asarray(data["labels"])
        if feat_norm:
            feats = normalize_features_by_class(feats, labels)
        for c in range(num_classes):
            f = feats[labels == c]
            if len(f) == 0:
                continue
            if len(f) > max_points_per_class:
                f = f[rng.permutation(len(f))[:max_points_per_class]]
            subsets[(i, c)] = f
    n = len(npz_paths)
    out = np.zeros((n, num_classes, n, num_classes))
    for (i, ci), f1 in subsets.items():
        for (j, cj), f2 in subsets.items():
            out[i, ci, j, cj] = avg_hausdorff_np(f1, f2)
    return out


def effective_receptive_field(model, variables, input_shape,
                              layer: Optional[str] = None) -> np.ndarray:
    """Gradient-based ERF: d(center output activation)/d(input), averaged over
    channels. One jax.grad call on the jitted model."""
    # random probe input: an all-zero input can die at the first ReLU
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1,) + tuple(input_shape)) * 0.5

    # variables as an explicit argument: closed-over params become HLO
    # constants and can exceed the axon remote-compile request cap (413)
    def probe(v, inp):
        out = model.apply(v, inp, train=False)
        h, w = out.shape[1] // 2, out.shape[2] // 2
        return jnp.sum(out[0, h, w])

    g = jax.jit(jax.grad(probe, argnums=1))(variables, x)
    return np.abs(np.asarray(g[0])).mean(-1)


def layer_receptive_fields(model, variables, input_shape,
                           layers: Optional[Sequence[int]] = None
                           ) -> Dict[str, np.ndarray]:
    """Per-feature-layer gradient ERF maps (the reference's ``--vis rf``:
    internal_util.py:21-58 probing each ``net.feature_maps[i]`` center with
    the vendored receptivefield/ library, segtran2d.py:316-409). Layer order
    mirrors the reference's feature_maps: the in-FPN output first, then each
    transformer layer's fused tokens reshaped onto the FPN grid. For each
    selected layer i we take d(sum_c feat[center])/d(input) with one
    jax.grad and return |grad| averaged over input channels ([H, W]).
    Models that sow no intermediates fall back to probing the output head
    (one 'output' entry)."""
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1,) + tuple(input_shape)) * 0.5

    def feat_list(inp, variables=variables):
        _, mstate = model.apply(variables, inp, train=False,
                                mutable=["intermediates"])
        inter = mstate.get("intermediates", {})
        feats = []
        hw = None
        if "in_fpn_feat" in inter:
            f = inter["in_fpn_feat"][0]
            hw = f.shape[1:3]
            feats.append(("in_fpn", f))
        vf = inter.get("voxel_fusion", {})
        keys = sorted((k for k in vf if k.endswith("_vfeat")),
                      key=lambda k: int(k.split("_")[1]))
        for k in keys:
            f = vf[k][0]                       # [B, N, C]
            if hw is not None and f.ndim == 3 \
                    and f.shape[1] == hw[0] * hw[1]:
                f = f.reshape((f.shape[0],) + tuple(hw) + (f.shape[-1],))
            if f.ndim == 4:
                feats.append((k[:-len("_vfeat")], f))
        return feats

    # name discovery via abstract evaluation -- no device work (eager
    # per-op dispatch through the axon tunnel is round-trip bound); the
    # names come out through a trace-time side channel because eval_shape
    # outputs must be array-like
    names: list = []

    def _discover(v, inp):
        names.extend(n for n, _ in feat_list(inp, variables=v))
        return jnp.zeros(())

    jax.eval_shape(_discover, variables, x)
    out: Dict[str, np.ndarray] = {}
    if not names:
        def probe_out(v, inp):
            o = model.apply(v, inp, train=False)
            return jnp.sum(o[0, o.shape[1] // 2, o.shape[2] // 2])
        g = jax.jit(jax.grad(probe_out, argnums=1))(variables, x)
        out["output"] = np.abs(np.asarray(g[0], np.float32)).mean(-1)
        return out
    sel = list(range(len(names))) if layers is None else \
        [i for i in layers if 0 <= i < len(names)]
    for i in sel:
        def probe(v, inp, i=i):
            f = feat_list(inp, variables=v)[i][1]
            return jnp.sum(f[0, f.shape[1] // 2, f.shape[2] // 2])
        g = jax.jit(jax.grad(probe, argnums=1))(variables, x)
        out[names[i]] = np.abs(np.asarray(g[0], np.float32)).mean(-1)
    return out


def compute_dataset_stats(dataset, sample_limit: int = 500) -> Dict:
    """Per-dataset channel mean/std over images in [0,1] (reference
    calcstat.py:42-73). Returns {'mean': [...], 'std': [...]}."""
    s = np.zeros(3)
    s2 = np.zeros(3)
    n = 0
    for i in range(min(len(dataset), sample_limit)):
        img = np.asarray(dataset[i]["image"], np.float64)
        s += img.reshape(-1, img.shape[-1]).sum(0)
        s2 += (img ** 2).reshape(-1, img.shape[-1]).sum(0)
        n += img.shape[0] * img.shape[1]
    mean = s / n
    std = np.sqrt(np.maximum(s2 / n - mean ** 2, 0))
    return {"mean": [round(float(v), 4) for v in mean],
            "std": [round(float(v), 4) for v in std]}


def write_stats_json(stats_by_ds: Dict[str, Dict], out_path: str):
    """Write the reference's stats-JSON format ({'mean': {ds: [...]}, ...})."""
    out = {"mean": {k: v["mean"] for k, v in stats_by_ds.items()},
           "std": {k: v["std"] for k, v in stats_by_ds.items()}}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=4)


def vcdr_csv_eval(pred_csv: str, gt_csv: str) -> Dict[str, float]:
    """Mean absolute vCDR error between two CSVs of `name,vcdr` rows
    (reference test-vcdr.py)."""
    def read(p):
        out = {}
        with open(p) as f:
            for ln in f:
                parts = ln.strip().split(",")
                if len(parts) >= 2:
                    try:
                        out[parts[0]] = float(parts[1])
                    except ValueError:
                        continue
        return out
    pred, gt = read(pred_csv), read(gt_csv)
    common = sorted(set(pred) & set(gt))
    errs = [abs(pred[k] - gt[k]) for k in common]
    return {"mae": float(np.mean(errs)) if errs else float("nan"),
            "n": len(common)}

"""Contrastive reference-feature losses + feature-space statistics.

Parity targets in the reference (internal_util.py):
  * pearson / lr_pearson               -> internal_util.py:77-98
  * initialize_reference_features      -> internal_util.py:99-125
  * avg_hausdorff / avg_hausdorff_np   -> internal_util.py:128-152
  * calc_contrast_losses               -> internal_util.py:154-194

The reference keeps a bank of per-class reference feature vectors (dumped by
``test2d.py --savefeat``) and, during training, pulls each class's pixel
features toward the same-class bank (one-way average-Hausdorff, topk=3) and
optionally pushes them away from a random other class's bank
(``do_neg_contrast``). NOTE: the trainer-side wiring is absent from the
public reference snapshot (only the arg names survive in test2d.py:455-456's
checkpoint-arg list), so the combination sign used by ``cli/train2d.py``
(``contrast_w * (pos - neg)``) is our choice, documented there.

TPU-native formulation: the torch code boolean-masks a *dynamic* number of
class pixels and randomly subsamples to bound cost -- both shapes are
data-dependent and unjittable. Here we instead compute the distance matrix
from ALL feature-grid pixels to the whole bank in ONE [P, K*R] cdist (a
single MXU matmul; ~4e7 entries at segtran grid sizes, trivial) and take a
mask-WEIGHTED mean of each pixel's topk-distance. When the torch code does
not subsample (``num_contrast_features`` >= class pixel count) the two are
numerically identical; parity-tested in tests/test_contrast.py.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_linear


def pearson(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation between two equal-shape tensors, fully flattened
    (reference internal_util.py:77-92; the reference only implements the
    ``dim == -1`` flatten-everything branch)."""
    a = t1.reshape(-1).astype(jnp.float32)
    b = t2.reshape(-1).astype(jnp.float32)
    az = a - a.mean()
    bz = b - b.mean()
    n1 = jnp.sqrt(jnp.sum(az ** 2))
    n2 = jnp.sqrt(jnp.sum(bz ** 2))
    n1 = jnp.where(n1 < 1e-5, 1.0, n1)
    n2 = jnp.where(n2 < 1e-5, 1.0, n2)
    return jnp.sum(az * bz) / (n1 * n2)


def lr_pearson(t1: jnp.ndarray) -> jnp.ndarray:
    """Pearson between the left/right halves of the last dim (reference
    internal_util.py:94-97)."""
    half = t1.shape[-1] // 2
    return pearson(t1[..., :half], t1[..., half:2 * half])


def _cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix [P, R] via one matmul (MXU-friendly).

    sqrt is clamped at 1e-12: exact-zero distances would give inf gradients
    (torch.cdist has the same pathology); the value error is <=1e-6."""
    sq = (jnp.sum(a ** 2, -1)[:, None] + jnp.sum(b ** 2, -1)[None, :]
          - 2.0 * a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


def avg_hausdorff(a: jnp.ndarray, b: jnp.ndarray, topk: int = 1,
                  one_way: bool = False,
                  exclude_id: bool = True) -> jnp.ndarray:
    """Average-Hausdorff distance between point sets a [P, C] and b [R, C]
    (reference internal_util.py:139-152): mean over a's points of the mean of
    the topk smallest distances to b; symmetrized with b's min-distance mean
    unless one_way. exclude_id replaces exact-zero distances with 1e6 (used
    when a is b to ignore self-distances)."""
    d = _cdist(a.astype(jnp.float32), b.astype(jnp.float32))
    if exclude_id:
        d = jnp.where(d <= 1e-6, 1e6, d)
    a_top = -jax.lax.top_k(-d, topk)[0]           # [P, topk] smallest
    avg_a = a_top.mean()
    if one_way:
        return avg_a
    avg_b = d.min(axis=0).mean()
    return (avg_a + avg_b) / 2


def avg_hausdorff_np(a: np.ndarray, b: np.ndarray,
                     exclude_id: bool = True) -> float:
    """NumPy average-Hausdorff (reference internal_util.py:128-137), used by
    the t-SNE checkpoint-feature analysis (reference tsne.py:145-158)."""
    d = np.sqrt(np.maximum(
        (a ** 2).sum(-1)[:, None] + (b ** 2).sum(-1)[None, :]
        - 2.0 * a.astype(np.float64) @ b.astype(np.float64).T, 0.0))
    if exclude_id:
        d[d == 0] = 1e6
    return float((d.min(axis=1).mean() + d.min(axis=0).mean()) / 2)


def load_reference_features(
        path: str, num_ref_features: int, num_classes: int,
        selected_ref_classes: Optional[Sequence[int]] = None,
        seed: int = 0, topk: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load a per-pixel feature dump and bucket it by class (reference
    initialize_reference_features, internal_util.py:99-125).

    Accepts our ``--savefeat`` .npz (keys features/labels,
    tools/analysis.dump_pixel_features) or the reference's torch .pth dict
    (same keys, internal_util.py:100-101). Classes with more than
    ``num_ref_features`` points are subsampled with a seeded permutation
    (reference :116-121); classes not in ``selected_ref_classes`` (when
    given) are skipped (reference :109-112).

    Returns a fixed-shape jit-friendly bank instead of the reference's ragged
    per-class list: (bank [K, R, C] float32, valid [K, R] bool). Classes with
    fewer than ``topk`` usable points are fully invalidated (the topk mean
    would otherwise read padding).
    """
    if path.endswith(".npz") or path.endswith(".npy"):
        data = np.load(path)
        features = np.asarray(data["features"], np.float32)
        labels = np.asarray(data["labels"])
    else:
        import torch
        d = torch.load(path, map_location="cpu")
        features = d["features"].numpy().astype(np.float32)
        labels = d["labels"].numpy()
    rng = np.random.RandomState(seed)
    r = num_ref_features
    bank = np.zeros((num_classes, r, features.shape[1]), np.float32)
    valid = np.zeros((num_classes, r), bool)
    for i in range(num_classes):
        if selected_ref_classes and i not in selected_ref_classes:
            continue
        cls = features[labels == i]
        if len(cls) > r:
            cls = cls[rng.permutation(len(cls))[:r]]
        if len(cls) < topk:
            continue
        bank[i, :len(cls)] = cls
        valid[i, :len(cls)] = True
    return bank, valid


def calc_contrast_losses(
        features: jnp.ndarray, mask: jnp.ndarray, bank: jnp.ndarray,
        bank_valid: jnp.ndarray, class_weights: jnp.ndarray,
        rng: Optional[jax.Array] = None, do_neg_contrast: bool = False,
        topk: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Positive/negative contrastive losses (reference calc_contrast_losses,
    internal_util.py:154-194), jittable.

    features [B, h, w, C] channels-last feature map; mask [B, H, W, K] n-hot
    ground truth (bilinearly resized to the feature grid, thresholded at 0.5
    -- reference :156-159); bank/bank_valid from load_reference_features;
    class_weights [K].

    Per foreground class c: pos += w_c * mean over class-c pixels of the mean
    of the topk(=3) smallest distances to bank[c] (one-way avg-Hausdorff,
    reference :175-178). With do_neg_contrast, a uniformly random OTHER class
    n_c = (c + U{1..K-1}) % K contributes 0.5 * w_c * the same statistic
    against bank[n_c] (reference :180-193; the reference draws via np.random
    at trace time -- we use ``rng`` so every step resamples). Classes with an
    empty bank or no pixels in the batch contribute 0.
    """
    k = bank.shape[0]
    b, h, w, c = features.shape
    m_small = resize_linear(mask.astype(jnp.float32), (h, w))
    onehot = (m_small >= 0.5).reshape(-1, k)             # [P, K]
    feats = features.reshape(-1, c).astype(jnp.float32)  # [P, C]

    d = _cdist(feats, bank.reshape(-1, bank.shape[-1]))  # [P, K*R]
    d = d.reshape(-1, k, bank.shape[1])
    d = jnp.where(bank_valid[None], d, jnp.inf)
    # per-pixel mean of the topk smallest distances to each class's bank
    dpix = -jax.lax.top_k(-d.transpose(1, 0, 2),
                          topk)[0].mean(-1)              # [K, P]
    cls_has_bank = bank_valid.any(-1)                    # [K]
    dpix = jnp.where(cls_has_bank[:, None], dpix, 0.0)

    wpix = onehot.T.astype(jnp.float32)                  # [K, P]
    npix = wpix.sum(-1)
    # mean topk-distance of each class's pixels to every class's bank [K, K]:
    # row = pixel class, col = bank class
    mean_d = (wpix @ dpix.T) / jnp.maximum(npix, 1.0)[:, None]
    gate = (npix > 0) & cls_has_bank                     # [K] pixel-side
    fg = jnp.arange(k) >= 1

    pos = jnp.sum(jnp.where(gate & fg, jnp.diag(mean_d) * class_weights, 0.0))
    if not do_neg_contrast:
        return pos, jnp.zeros(())
    if rng is None:
        raise ValueError("do_neg_contrast requires an rng key")
    offs = jax.random.randint(rng, (k,), 1, k)
    neg_cls = (jnp.arange(k) + offs) % k                 # [K]
    neg_d = jnp.take_along_axis(mean_d, neg_cls[:, None], axis=1)[:, 0]
    neg_gate = (npix > 0) & fg & cls_has_bank[neg_cls]
    neg = jnp.sum(jnp.where(neg_gate, 0.5 * neg_d * class_weights, 0.0))
    return pos, neg


def normalize_features_by_class(features: np.ndarray,
                                classes: np.ndarray) -> np.ndarray:
    """Per-class parameter-free LayerNorm over the channel dim (reference
    tsne.py:118-139 ``--featnorm`` path: a fresh nn.LayerNorm applied to each
    class's features before t-SNE / Hausdorff)."""
    out = features.astype(np.float32).copy()
    for i in np.unique(classes):
        sel = classes == i
        f = out[sel]
        mu = f.mean(-1, keepdims=True)
        var = f.var(-1, keepdims=True)
        out[sel] = (f - mu) / np.sqrt(var + 1e-5)
    return out

"""Evaluation metrics: Dice / Jaccard (jit-friendly), plus surface metrics
(Hausdorff / ASD) via medpy when available, matching the reference's metric
stack (test_util2d.py:229-265 calc_dice/calc_batch_metric;
test_util3d.py:186-215 calculate_metric_percase)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def have_medpy() -> bool:
    try:
        from medpy.metric import binary as _  # noqa: F401
        return True
    except ImportError:
        return False


def log_metric_stack(logger) -> None:
    """One startup line saying which metrics will be reported: without medpy
    the surface metrics (hd95/asd) come back NaN and are silently dropped
    from averages, so say so up front."""
    if have_medpy():
        logger.info("metric stack: dice, jaccard, hd95, asd (medpy present)")
    else:
        logger.info("metric stack: dice, jaccard only -- medpy not installed,"
                    " hd95/asd will be NaN and excluded from averages")


def dice_score(pred: jnp.ndarray, gt: jnp.ndarray,
               smooth: float = 1e-5) -> jnp.ndarray:
    """Dice over the last two (or more) spatial dims; inputs same shape,
    binary/soft. Matches reference calc_dice (test_util2d.py:229-238)."""
    axes = tuple(range(pred.ndim - 2, pred.ndim)) if pred.ndim >= 2 else None
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    inter = jnp.sum(pred * gt, axis=axes)
    denom = jnp.sum(pred * pred, axis=axes) + jnp.sum(gt * gt, axis=axes)
    return (2 * inter + smooth) / (denom + smooth)


def dice_score_nd(pred: np.ndarray, gt: np.ndarray,
                  smooth: float = 1e-5) -> float:
    """Dice over ALL dims (3D volumes; reference medpy dc equivalent)."""
    pred = pred.astype(np.float64)
    gt = gt.astype(np.float64)
    inter = float((pred * gt).sum())
    denom = float(pred.sum() + gt.sum())
    return (2 * inter + smooth) / (denom + smooth)


def jaccard_score(pred: np.ndarray, gt: np.ndarray,
                  smooth: float = 1e-5) -> float:
    pred = pred.astype(np.float64)
    gt = gt.astype(np.float64)
    inter = float((pred * gt).sum())
    union = float(pred.sum() + gt.sum()) - inter
    return (inter + smooth) / (union + smooth)


def batch_dice_per_class(pred_hard: jnp.ndarray, gt: jnp.ndarray,
                         num_classes: int) -> jnp.ndarray:
    """[B, *, C] hard predictions & gt -> [B, num_classes-1] dice (skipping
    background), matching reference calc_batch_metric."""
    scores = []
    for cls in range(1, num_classes):
        p = pred_hard[..., cls].reshape(pred_hard.shape[0], -1)
        g = gt[..., cls].reshape(gt.shape[0], -1)
        inter = jnp.sum(p * g, axis=1)
        denom = jnp.sum(p * p, axis=1) + jnp.sum(g * g, axis=1)
        scores.append((2 * inter + 1e-5) / (denom + 1e-5))
    return jnp.stack(scores, axis=1)


def surface_metrics(pred: np.ndarray, gt: np.ndarray,
                    spacing: Optional[tuple] = None):
    """Hausdorff95 + average surface distance via medpy if installed (the
    reference uses medpy.metric.binary, test_util3d.py:196-206); returns
    (hd95, asd) or (nan, nan) if medpy or a nonempty mask is unavailable."""
    try:
        from medpy.metric import binary as mb
    except ImportError:
        return float("nan"), float("nan")
    if pred.sum() == 0 or gt.sum() == 0:
        return float("nan"), float("nan")
    return (float(mb.hd95(pred, gt, voxelspacing=spacing)),
            float(mb.asd(pred, gt, voxelspacing=spacing)))

"""BraTS label-space mappings, channels-last.

Parity targets (reference code/dataloaders/datasets3d.py):
  * brats_map_label (:16-40): raw labels {0,1,2,3} -> 4-channel overlapping
    n-hot (bg, ET, WT, TC) where WT >= TC >= ET,
  * make_brats_pred_consistent (:43-61): enforce the class nesting on soft
    predictions (max-fix by default, min-fix if conservative),
  * brats_inv_map_label (:63-88): n-hot probs -> per-raw-label probs,
  * harden_segmap3d == harden_segmap in .labelmaps (threshold + bg fix).
"""
from __future__ import annotations

import jax.numpy as jnp


def brats_map_label(mask: jnp.ndarray, binarize: bool = False) -> jnp.ndarray:
    """Raw label volume [..., H, W, D] ints -> [..., H, W, D, C] n-hot."""
    if binarize:
        return jnp.stack([mask == 0, mask > 0], axis=-1).astype(jnp.float32)
    bg = mask == 0
    et = mask == 3                                   # P(ET) = P(3)
    wt = (mask == 1) | (mask == 2) | (mask == 3)     # whole tumor
    tc = (mask == 1) | (mask == 3)                   # tumor core
    return jnp.stack([bg, et, wt, tc], axis=-1).astype(jnp.float32)


def make_brats_pred_consistent(preds_soft: jnp.ndarray,
                               is_conservative: bool = False) -> jnp.ndarray:
    """preds_soft: [..., C=4] channels-last (bg, ET, WT, TC)."""
    bg, et, wt, tc = (preds_soft[..., 0], preds_soft[..., 1],
                      preds_soft[..., 2], preds_soft[..., 3])
    if is_conservative:
        # P(ET) = min(P(ET), P(WT), P(TC)); P(TC) = min(P(TC), P(WT))
        et2 = jnp.minimum(jnp.minimum(et, wt), tc)
        tc2 = jnp.minimum(wt, tc)
        return jnp.stack([bg, et2, wt, tc2], axis=-1)
    # P(WT) = max(P(ET), P(WT), P(TC)); P(TC) = max(P(ET), P(TC))
    wt2 = jnp.maximum(jnp.maximum(et, wt), tc)
    tc2 = jnp.maximum(et, tc)
    return jnp.stack([bg, et, wt2, tc2], axis=-1)


def brats_inv_map_label(orig_probs: jnp.ndarray,
                        up: float = 1.5) -> jnp.ndarray:
    """n-hot probs [..., 4] -> raw-label probs [..., 4] (labels 0..3);
    reference :63-88 (incl. the 1.5x boost of labels 1 and 2)."""
    et, wt, tc = orig_probs[..., 1], orig_probs[..., 2], orig_probs[..., 3]
    p0 = 1.0 - wt
    p3 = et
    p1 = (tc - et) * up
    p2 = (wt - tc) * up
    return jnp.stack([p0, p1, p2, p3], axis=-1)

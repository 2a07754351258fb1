"""Segmentation losses, jit-friendly.

Parity targets in the reference:
  * per-example Dice   -> code/utils/losses.py:47-60 (dice_loss_indiv)
  * whole-batch Dice   -> code/utils/losses.py:63-71 (dice_loss_mix)
  * weighted BCE       -> code/train2d.py:1128 (BCEWithLogitsLoss(pos_weight))
  * vCDR               -> code/utils/losses.py:76-97 (batched branch)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMOOTH = 1e-5


def dice_loss_indiv(score: jnp.ndarray, gt_mask: jnp.ndarray,
                    weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-example Dice loss, averaged over the batch.

    score, gt_mask: [B, ...] (score already sigmoided). Mirrors reference
    utils/losses.py:47-60 exactly (including z_sum = sum(score^2)... note the
    reference uses sum(score*score) for z_sum).
    """
    b = score.shape[0]
    score = score.reshape(b, -1).astype(jnp.float32)
    gt = gt_mask.reshape(b, -1).astype(jnp.float32)
    intersect = jnp.sum(score * gt, axis=1)
    y_sum = jnp.sum(gt * gt, axis=1)
    z_sum = jnp.sum(score * score, axis=1)
    dice = (2.0 * intersect + _SMOOTH) / (z_sum + y_sum + _SMOOTH)
    loss = 1.0 - dice
    if weight is not None:
        return jnp.mean(loss * weight)
    return jnp.mean(loss)


def smooth_dice_loss(score: jnp.ndarray, gt_mask: jnp.ndarray,
                     running_denom: jnp.ndarray,
                     momentum: float = 0.1):
    """Smoothed Dice with a running-average denominator offset (reference
    utils/losses.py:7-44 SmoothDiceLoss; unused in the reference main path
    but part of its loss inventory). State is explicit for jit: pass the
    previous running_denom (scalar; <0 means uninitialized) and carry the
    returned one. Returns (smooth_loss, orig_loss, new_running_denom)."""
    eps = 1e-5
    b = score.shape[0]
    s = score.reshape(b, -1).astype(jnp.float32)
    g = gt_mask.reshape(b, -1).astype(jnp.float32)
    intersect = jnp.sum(s * g, axis=1)
    denom = jnp.sum(s * s, axis=1) + jnp.sum(g * g, axis=1) + eps
    mean_denom = jnp.mean(denom)
    new_running = jnp.where(running_denom < 0, mean_denom,
                            running_denom * (1 - momentum)
                            + mean_denom * momentum)
    dyn_offset = jnp.where(running_denom < 0, jnp.zeros_like(denom),
                           new_running - jax.lax.stop_gradient(denom))
    smooth_dice = (2 * intersect + eps + dyn_offset) / (denom + dyn_offset)
    orig_dice = (2 * intersect + eps) / denom
    return (jnp.mean(1 - smooth_dice), jnp.mean(1 - orig_dice), new_running)


def dice_loss_mix(score: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Whole-batch Dice loss (reference utils/losses.py:63-71). Note the
    reference uses plain sums (not squared) for the denominator here."""
    score = score.astype(jnp.float32)
    gt = gt_mask.astype(jnp.float32)
    intersect = jnp.sum(score * gt)
    denom = jnp.sum(score) + jnp.sum(gt)
    dice = (2.0 * intersect + _SMOOTH) / (denom + _SMOOTH)
    return 1.0 - dice


def weighted_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                             pos_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Numerically-stable BCEWithLogits with per-class pos_weight broadcast over
    the channel axis (targets/logits: [B, C, ...] or [B, ..., C] -- pos_weight
    must already be shaped to broadcast). Matches torch BCEWithLogitsLoss."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) formulation
    neg_abs = -jnp.abs(logits)
    log_sig = jnp.minimum(logits, 0.0) - jnp.log1p(jnp.exp(neg_abs))  # log sigmoid(x)
    log_one_minus = -jnp.maximum(logits, 0.0) - jnp.log1p(jnp.exp(neg_abs))  # log(1-sigmoid)
    if pos_weight is None:
        loss = -(targets * log_sig + (1.0 - targets) * log_one_minus)
    else:
        loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)
    return jnp.mean(loss)


def calc_vcdr_batch(mask_nhot_soft: jnp.ndarray, thres: float = 0.5) -> jnp.ndarray:
    """Vertical cup-to-disc ratio for fundus masks, batched & jit-friendly.

    mask_nhot_soft: [B, H, W, C] channels-last, C>=3 with channel 1 = disc,
    channel 2 = cup. Mirrors reference utils/losses.py:76-97 (batched branch):
    vertical extent measured via (max - min) of occupied row indices (1-based).
    """
    mask = mask_nhot_soft >= thres
    B, H = mask.shape[0], mask.shape[1]
    vert_idx = jnp.arange(1, H + 1, dtype=jnp.float32)[None, :]  # [1, H]

    def extent(channel):  # channel: [B, H, W] bool
        occupied = jnp.any(channel, axis=2)                      # [B, H]
        idx = occupied * vert_idx
        # max of occupied indices minus min of occupied (nonzero) indices;
        # reference computes min over the 0-filled indexed array, which is 0
        # whenever any row is unoccupied -- reproduce that exactly.
        return jnp.max(idx, axis=1) - jnp.min(idx, axis=1)

    disc_len = extent(mask[..., 1])
    cup_len = extent(mask[..., 2])
    return cup_len / (disc_len + 1e-4)


def calc_vcdr_eval(mask_nhot_soft: jnp.ndarray, thres: float = 0.5,
                   delta: int = 1) -> jnp.ndarray:
    """Per-image vCDR with the reference's NO-BATCH semantics, vectorized.

    The reference eval path (calc_batch_metric, test_util2d.py:258-261)
    passes each instance as a 3-D tensor, hitting utils/losses.py:99-127:
    extents are max-min-DELTA over the truly-occupied rows (no 0-index
    quirk), no disc found -> -1, no cup found -> 0. The batched branch
    (calc_vcdr_batch above, used by the vCDR training losses) measures
    differently; eval must use this variant to match reference Dice reports.
    mask_nhot_soft: [B, H, W, C]; returns [B]."""
    mask = mask_nhot_soft >= thres
    H = mask.shape[1]
    vert_idx = jnp.arange(1, H + 1, dtype=jnp.float32)[None, :]  # [1, H]

    def extent(channel):  # [B, H, W] bool -> (len [B], found [B])
        occupied = jnp.any(channel, axis=2)                      # [B, H]
        found = jnp.any(occupied, axis=1)
        mx = jnp.max(jnp.where(occupied, vert_idx, -jnp.inf), axis=1)
        mn = jnp.min(jnp.where(occupied, vert_idx, jnp.inf), axis=1)
        return mx - mn - delta, found

    disc_len, has_disc = extent(mask[..., 1])
    cup_len, has_cup = extent(mask[..., 2])
    vcdr = cup_len / (disc_len + 1e-4)
    vcdr = jnp.where(has_cup, vcdr, 0.0)
    return jnp.where(has_disc, vcdr, -1.0)

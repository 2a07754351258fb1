"""Auxiliary training losses: attention consistency, reconstruction, domain
adversarial (RevGrad / ADDA), vCDR estimation.

Parity targets in the reference:
  * attention-consistency loss  -> train2d.py:668-723 (margin-thresholded
    deviation from the mean score on (in)consistent pixel pairs; squeezed
    layers combine in/out scores by matmul after 1x1 mode-pooling convs,
    segtran_shared.py:896-905)
  * reconstruction loss         -> train2d.py:923-926, 1253-1257 (1x1 conv
    head on the last feature map + MSE to the input)
  * domain adversarial loss     -> train2d.py:1259-1286 (discriminator on
    features or predicted masks; RevGrad folds the minimax into one step,
    ADDA alternates)
  * vCDR estimation losses      -> train2d.py:1288-1312
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..ops.losses import weighted_bce_with_logits
from ..ops.resize import resize_linear


def collect_attn_scores(inter) -> list:
    """Per-layer attention scores from the sown intermediates, mode-pooled.
    Squeezed layers yield (in_scores [B,1,A,N], out_scores [B,1,N,A]) pairs;
    plain layers a single [B,1,N,N]. The mean over modes replaces the
    reference's learned 1x1 mode-pooling convs (segtran_shared.py:896-905)."""
    vf = inter.get("intermediates", inter).get("voxel_fusion", {})
    layers = []
    for k in sorted(k for k in vf if k.startswith("translayers_")):
        node = vf[k]
        if "in_ator_trans" in node:
            in_s = node["in_ator_trans"]["attention_scores"][0]
            out_s = node["ator_out_trans"]["attention_scores"][0]
            layers.append((in_s.mean(1, keepdims=True),
                           out_s.mean(1, keepdims=True)))
        elif "attention_scores" in node:
            layers.append(node["attention_scores"][0].mean(1, keepdims=True))
    return layers


def collect_attn_diag(inter) -> Optional[jnp.ndarray]:
    """Aggregate the sown per-call attention diagnostics (attention.py
    keep_attn_diag: [max, pos-avg, clamped] per attention call) into one
    [max over calls, mean of avgs, clamp count] vector, or None."""
    rows = []

    def walk(t):
        if not isinstance(t, dict):
            return
        for k, v in t.items():
            if k == "attn_diag":
                rows.extend(v if isinstance(v, (tuple, list)) else [v])
            else:
                walk(v)

    walk(inter.get("intermediates", inter))
    if not rows:
        return None
    stats = jnp.stack(rows)                              # [calls, 3]
    return jnp.stack([jnp.max(stats[:, 0]), jnp.mean(stats[:, 1]),
                      jnp.sum(stats[:, 2])])


def attention_consistency_loss(layers_attn_scores: Sequence,
                               mask: jnp.ndarray,
                               feat_shape: Sequence[int],
                               only_first_layer: bool = False) -> jnp.ndarray:
    """layers_attn_scores: per layer either a single [B, 1, N, N] score matrix
    or a (in_scores [B,1,A,N], out_scores [B,1,N,A]) pair (squeezed, already
    mode-pooled). mask: [B, H, W, C] n-hot ground truth."""
    resized = resize_linear(mask, feat_shape)
    b, c = resized.shape[0], resized.shape[-1]
    flat = resized.reshape(b, -1, c)                     # [B, N, C]
    consistency = jnp.einsum("bnc,bmc->bnm", flat, flat)
    # any positive soft-mask dot product counts as a consistent pair
    # (reference train2d.py:681-684: torch.clip(...).bool())
    consistency = consistency > 0.0

    n_layers = 1 if only_first_layer else len(layers_attn_scores)
    total = 0.0
    for scores in layers_attn_scores[:n_layers]:
        if isinstance(scores, (tuple, list)):
            # squeezed layer: combine out (N<-A) and in (A<-N) scores into an
            # N x N matrix (reference train2d.py:693-697)
            in_s, out_s = scores
            scores = jnp.matmul(out_s, in_s)[:, 0]
        else:
            scores = scores[:, 0]
        mean_score = scores.mean(axis=(1, 2), keepdims=True)
        margin = 0.1
        below = scores < mean_score
        above = scores > (mean_score - margin)
        inconsistent = (below & consistency) | (above & ~consistency)
        dev = jnp.abs(scores - mean_score)
        cnt = jnp.sum(inconsistent) + 1e-6
        total = total + jnp.sum(dev * inconsistent) / cnt
    loss = total / n_layers
    # Cap at 1 with a detached denominator (reference train2d.py:721-722)
    return jnp.where(loss > 1.0,
                     loss / jnp.maximum(jax.lax.stop_gradient(loss), 1.0),
                     loss)


def attention_consistency_loss_3d(layers_attn_scores: Sequence,
                                  mask: jnp.ndarray,
                                  feat_shape: Sequence[int],
                                  only_first_layer: bool = True,
                                  depth_first: bool = True) -> jnp.ndarray:
    """The 3D trainer's attention-consistency loss (reference
    train3d.py:426-449): BCE-with-logits between the attention scores and the
    binary mask-consistency matrix. NOTE this differs from the 2D trainer's
    margin-thresholded form (train2d.py:668-723) -- the reference uses
    different math in the two drivers and we reproduce both.

    mask: [B, H, W, D, C] channels-last n-hot. feat_shape is the token grid
    in raster order: Segtran3d rasters (d2, h2, w2) like the reference's
    [D2,H2,W2] flatten (depth_first=True); Segtran25d rasters (h2, w2, d3)
    (depth_first=False).
    """
    if depth_first:
        m = mask.transpose(0, 3, 1, 2, 4)                 # [B, D, H, W, C]
    else:
        m = mask
    resized = resize_linear(m.astype(jnp.float32), feat_shape)
    b, c = resized.shape[0], resized.shape[-1]
    flat = resized.reshape(b, -1, c)                      # [B, N, C]
    consistency = jnp.clip(
        jnp.einsum("bnc,bmc->bnm", flat, flat), 0.0, 1.0)

    n_layers = 1 if only_first_layer else len(layers_attn_scores)
    total = 0.0
    for scores in layers_attn_scores[:n_layers]:
        if isinstance(scores, (tuple, list)):
            in_s, out_s = scores
            scores = jnp.matmul(out_s, in_s)              # [B, 1, N, N]
        total = total + weighted_bce_with_logits(scores[:, 0], consistency)
    return total / n_layers


def recon_loss(recon_head_apply, feature_map: jnp.ndarray,
               image: jnp.ndarray) -> jnp.ndarray:
    """MSE between the input image and a reconstruction from the last feature
    map (reference train2d.py:1253-1257)."""
    reconed = recon_head_apply(feature_map)
    if reconed.shape[1:3] != image.shape[1:3]:
        reconed = resize_linear(reconed, image.shape[1:3])
    return jnp.mean((reconed.astype(jnp.float32)
                     - image.astype(jnp.float32)) ** 2)


def domain_adversarial_loss(disc_apply, source_feat: jnp.ndarray,
                            target_feat: jnp.ndarray) -> jnp.ndarray:
    """Discriminator BCE with source=0 / target=1 labels (reference
    train2d.py:1262-1277). With a RevGrad discriminator the returned loss
    trains the discriminator AND reverses into the feature extractor."""
    mix = jnp.concatenate([source_feat, target_feat], axis=0)
    labels = jnp.concatenate(
        [jnp.zeros((source_feat.shape[0], 1), jnp.float32),
         jnp.ones((target_feat.shape[0], 1), jnp.float32)], axis=0)
    scores = disc_apply(mix)
    return weighted_bce_with_logits(scores, labels)


def vcdr_estimation_losses(estimate, probs: jnp.ndarray,
                           gt_mask: jnp.ndarray) -> dict:
    """vCDR losses (reference train2d.py:1288-1312).

    estimate: callable [B,H,W,C] probs -> [B] sigmoided vCDR predictions
    (the reference's estimate_vcdr, train2d.py:655-664 -- single-estimator or
    sep vc/vd ratio, ending in .sigmoid()).

    The estimator regresses the hard-threshold vCDR of the prediction
    (estimator-only gradient: the estimator input is detached and calc_vcdr's
    thresholding blocks gradients into the net), and the estimator's output on
    live probs regresses the ground-truth vCDR (gradients into both)."""
    from ..ops.losses import calc_vcdr_batch
    vcdr_pred_hard = calc_vcdr_batch(probs)
    vcdr_estim_nograd = estimate(jax.lax.stop_gradient(probs))
    estim_loss = jnp.mean(jnp.abs(vcdr_estim_nograd - vcdr_pred_hard))
    vcdr_gt = calc_vcdr_batch(gt_mask)
    vcdr_estim = estimate(probs)
    net_loss = jnp.mean(jnp.abs(vcdr_estim - vcdr_gt))
    return {"vcdr_estim_loss": estim_loss, "vcdr_net_loss": net_loss}

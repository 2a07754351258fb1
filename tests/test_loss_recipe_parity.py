"""Training-loss recipe parity vs the torch oracle: pos-weight normalization
(reference train2d.py:814, train3d.py:516-518), Dice class weights
(train2d.py:1123-1127), BraTS class weights [0,3,1,1.75] (train3d.py:222-223),
and the (1-DICE_W)*BCE + DICE_W*sum(dice*w) assembly (train2d.py:1228-1247,
train3d.py:737-756)."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def _reference_loss(logits_nchw, mask_nchw, bce_weight, num_classes,
                    dice_w=0.5, focus_class=-1):
    """The reference loss on a fixed batch (train2d.py:1123-1128, 1228-1247 /
    train3d.py:692-756 -- identical math for 2D and 3D tensors)."""
    from utils.losses import dice_loss_indiv
    import torch.nn as nn
    w = torch.tensor(bce_weight, dtype=torch.float32)
    w = w * (num_classes - 1) / w.sum()        # train2d.py:814
    class_weights = torch.ones(num_classes)
    class_weights[0] = 0
    if focus_class != -1 and num_classes > 2:
        class_weights[focus_class] = 2
    class_weights /= class_weights.sum()
    bce_fn = nn.BCEWithLogitsLoss(pos_weight=w)
    logits = torch.tensor(logits_nchw)
    mask = torch.tensor(mask_nchw)
    # channel dim last for BCE (train2d.py:1228-1233 permute)
    perm = [0] + list(range(2, logits.ndim)) + [1]
    ce = bce_fn(logits.permute(perm), mask.permute(perm))
    probs = torch.sigmoid(logits)
    dice_total = 0
    for cls in range(1, num_classes):
        d = dice_loss_indiv(probs[:, cls], mask[:, cls])
        dice_total = dice_total + d * class_weights[cls]
    return float((1 - dice_w) * ce + dice_w * dice_total)


def test_fundus_loss_matches_reference():
    from segtran_tpu.train.trainer import make_loss_fn
    from segtran_tpu.configs.presets import TASK_SETTINGS
    task = TASK_SETTINGS["fundus"]
    nc = task["num_classes"]
    rng = np.random.RandomState(0)
    logits = rng.randn(2, nc, 24, 24).astype(np.float32)
    mask = (rng.rand(2, nc, 24, 24) > 0.5).astype(np.float32)

    ref = _reference_loss(logits, mask, list(task["bce_weight"]), nc)
    loss_fn = make_loss_fn(nc, task["bce_weight"])
    loss, metrics = loss_fn(jnp.asarray(logits).transpose(0, 2, 3, 1),
                            jnp.asarray(mask).transpose(0, 2, 3, 1))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)


def test_fundus_loss_with_focus_class():
    from segtran_tpu.train.trainer import make_loss_fn
    nc = 3
    rng = np.random.RandomState(3)
    logits = rng.randn(2, nc, 16, 16).astype(np.float32)
    mask = (rng.rand(2, nc, 16, 16) > 0.5).astype(np.float32)
    ref = _reference_loss(logits, mask, [0.0, 1.0, 2.0], nc, focus_class=2)
    loss_fn = make_loss_fn(nc, (0.0, 1.0, 2.0), focus_class=2)
    loss, _ = loss_fn(jnp.asarray(logits).transpose(0, 2, 3, 1),
                      jnp.asarray(mask).transpose(0, 2, 3, 1))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)


def test_brats_loss_matches_reference():
    """BraTS preset must carry the reference's [0, 3, 1, 1.75] class weights
    (train3d.py:222-223) and the train3d normalization (:516-518)."""
    from segtran_tpu.configs.presets import TASK_SETTINGS
    from segtran_tpu.ops.losses import (dice_loss_indiv,
                                        weighted_bce_with_logits)
    task = TASK_SETTINGS["brats"]
    nc = task["num_classes"]
    assert tuple(task["bce_weight"]) == (0.0, 3.0, 1.0, 1.75)

    rng = np.random.RandomState(1)
    logits = rng.randn(2, nc, 8, 8, 6).astype(np.float32)
    mask = (rng.rand(2, nc, 8, 8, 6) > 0.5).astype(np.float32)
    ref = _reference_loss(logits, mask, list(task["bce_weight"]), nc)

    # the train3d loss assembly (cli/train3d.py) on channels-last tensors
    bce = jnp.asarray(task["bce_weight"], jnp.float32)
    bce = bce * (nc - 1) / jnp.sum(bce)
    cw = jnp.ones(nc).at[0].set(0.0)
    cw = cw / cw.sum()
    lg = jnp.asarray(logits).transpose(0, 2, 3, 4, 1)
    mk = jnp.asarray(mask).transpose(0, 2, 3, 4, 1)
    import jax
    ce = weighted_bce_with_logits(lg, mk, bce.reshape(1, 1, 1, 1, nc))
    probs = jax.nn.sigmoid(lg)
    dice_total = 0.0
    for cls in range(1, nc):
        dice_total = dice_total + dice_loss_indiv(
            probs[..., cls], mk[..., cls]) * cw[cls]
    loss = 0.5 * ce + 0.5 * dice_total
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)

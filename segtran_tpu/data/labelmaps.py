"""Task label-space mappings, channels-last and jit-friendly.

Parity targets (reference code/dataloaders/datasets2d.py):
  * fundus_map_mask / fundus_inv_map_mask  (:91-171) -- REFUGE n-hot nesting
    (disc channel INCLUDES cup unless exclusive)
  * polyp_map_mask / polyp_inv_map_mask    (:199-249)
  * index_to_onehot / onehot_inv_map       (:22-88)
  * harden_segmap (2D :178-196; 3D datasets3d.py:95-113): threshold then force
    background = no-other-class.

All functions take/return channels-LAST arrays ([..., C] or [..., H, W] raw);
the reference's channel-first layout is a torch convention we do not keep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def index_to_onehot(mask: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer mask [..., H, W] -> one-hot [..., H, W, C]."""
    if isinstance(mask, np.ndarray):
        return np.eye(num_classes, dtype=np.float32)[np.asarray(mask, np.int64)]
    return jax.nn.one_hot(mask.astype(jnp.int32), num_classes)


def onehot_inv_map(mask_onehot: jnp.ndarray) -> jnp.ndarray:
    """One-hot [..., C] -> integer mask [...] (argmax)."""
    return jnp.argmax(mask_onehot, axis=-1).astype(jnp.uint8)


def fundus_map_mask(mask: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """REFUGE-style raw mask -> 3-channel n-hot [..., 3].

    Two raw encodings (reference :106-138):
      * channel form [..., H, W, >=2]: ch0>=1 disc(+cup), ch1>=1 cup
      * grayscale [..., H, W] or [..., H, W, 1]: 255 bg / 128 disc / 0 cup
        (datasets2d always appends a channel dim to grayscale masks)
    """
    grayscale = mask.ndim < 3
    if mask.ndim >= 3 and mask.shape[-1] == 1:
        mask = mask[..., 0]  # [..., H, W, 1] -> grayscale [..., H, W]
        grayscale = True
    if not grayscale and mask.shape[-1] >= 2:
        ch0, ch1 = mask[..., 0], mask[..., 1]
        bg = (ch0 == 0)
        disc = (ch0 >= 1) & (ch1 == 0) if exclusive else (ch0 >= 1)
        cup = (ch1 >= 1)
    else:
        bg = (mask == 255)
        disc = (mask == 128) if exclusive else (mask <= 128)
        cup = (mask == 0)
    return jnp.stack([bg, disc, cup], axis=-1).astype(jnp.float32)


def fundus_inv_map_mask(mask_nhot: jnp.ndarray) -> jnp.ndarray:
    """n-hot [..., 3] -> REFUGE grayscale (255 bg / 128 disc / 0 cup);
    later channels override earlier (reference :155-167)."""
    out = jnp.zeros(mask_nhot.shape[:-1], jnp.uint8)
    out = jnp.where(mask_nhot[..., 0] == 1, 255, out)
    out = jnp.where(mask_nhot[..., 1] == 1, 128, out)
    out = jnp.where(mask_nhot[..., 2] == 1, 0, out)
    return out.astype(jnp.uint8)


def polyp_map_mask(mask: jnp.ndarray, exclusive: bool = True) -> jnp.ndarray:
    """Polyp raw mask (ch0: 0 bg / 255 polyp) -> 2-channel n-hot.
    Accepts [..., H, W], [..., H, W, 1] or multi-channel [..., H, W, C]."""
    ch0 = mask[..., 0] if (mask.ndim >= 3 and mask.shape[-1] <= 4) else mask
    return jnp.stack([ch0 == 0, ch0 > 0], axis=-1).astype(jnp.float32)


def polyp_inv_map_mask(mask_nhot: jnp.ndarray) -> jnp.ndarray:
    out = jnp.zeros(mask_nhot.shape[:-1], jnp.uint8)
    out = jnp.where(mask_nhot[..., 1] == 1, 255, out)
    return out.astype(jnp.uint8)


def harden_segmap(mask_soft: jnp.ndarray, thres: float = 0.5) -> jnp.ndarray:
    """Soft n-hot [..., C] -> hard n-hot with background forced consistent
    (background = no other class fired; reference :178-196)."""
    hard = (mask_soft >= thres).astype(jnp.int32)
    bg = (jnp.sum(hard[..., 1:], axis=-1) == 0).astype(jnp.int32)
    return jnp.concatenate([bg[..., None], hard[..., 1:]], axis=-1)

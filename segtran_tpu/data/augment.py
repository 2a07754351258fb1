"""Device-side, batched, deterministic data augmentation.

TPU-native replacement for the reference's host-side imgaug/torchvision
pipelines (reference train_util.py:15-81 for 2D; datasets3d.py:456-665 for
3D). Every op is a pure, shape-static jnp function keyed by an explicit PRNG
key, vmapped over the batch and fused by XLA -- augmentation runs on-device in
the same graph as the train step instead of in host worker processes.

Op set mirrors the reference's:
  2D (train_util.py:33-64): resize to target (host side at load), random
  crop-and-pad +-randscale% (p=0.5), fliplr (p=0.2), flipud (p=0.2), rot90
  {90,180,270} (p=0.3), grayscale blend (alpha), ColorJitter (one of
  brightness/contrast/saturation 0.2 or all 0.1), per-dataset mean/std
  normalization.
  3D (datasets3d.py:478-608 + train3d.py:713-715): RandomRotFlip (xy rot90 +
  axis flips), RandomCrop (host side), RandomNoise (sigma 0.1 clip 0.2),
  batch-level RandomResizedCrop (randscale).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_linear

_GRAY_W = jnp.asarray([0.299, 0.587, 0.114])  # ITU-R 601-2 luma (PIL/imgaug)


@dataclasses.dataclass(frozen=True)
class Aug2dConfig:
    randscale: float = 0.0         # crop-and-pad percent (reference --randscale)
    crop_pad_prob: float = 0.5
    fliplr_prob: float = 0.2
    flipud_prob: float = 0.2
    rot90_prob: float = 0.3
    # --do_affine (reference train_util.py:25-50): p=0.3 rotate(-45,45) +
    # shear(-16,16), bilinear/reflect for images, nearest/zero for masks.
    do_affine: bool = False
    affine_prob: float = 0.3
    affine_rotate_deg: float = 45.0
    affine_shear_deg: float = 16.0
    gray_alpha: float = 0.5
    colorjitter: bool = True
    # robustness-training augmentation (reference --robustaug/--robustaugdeg,
    # train_util.py:66-81): extra ColorJitter with an explicit factor range,
    # e.g. robust_aug=("brightness", "contrast"), robust_aug_range=(0.5, 1.5)
    robust_aug: Tuple[str, ...] = ()
    robust_aug_range: Tuple[float, float] = (0.5, 1.5)
    mean: Tuple[float, ...] = (0.5, 0.5, 0.5)
    std: Tuple[float, ...] = (0.5, 0.5, 0.5)


def _rand_crop_and_pad(key, image, mask, percent: float):
    """imgaug CropAndPad(percent=(-p, p), pad_cval=0) + resize back: scale the
    canvas by a random factor in [1-p, 1+p], keeping the output size."""
    h, w = image.shape[0], image.shape[1]
    kf, ko = jax.random.split(key)
    f = jax.random.uniform(kf, (), minval=-percent, maxval=percent)
    # f > 0: zoom out (pad then resize down == shrink content);
    # f < 0: zoom in (crop then resize up). Implemented as one affine resample
    # with zero padding outside, which keeps shapes static.
    scale = 1.0 + f
    yy = (jnp.arange(h) - (h - 1) / 2.0) * scale + (h - 1) / 2.0
    xx = (jnp.arange(w) - (w - 1) / 2.0) * scale + (w - 1) / 2.0

    def sample(img, order):
        grid_y = jnp.clip(yy, 0, h - 1)
        grid_x = jnp.clip(xx, 0, w - 1)
        valid = ((yy >= -0.5) & (yy <= h - 0.5))[:, None] & \
                ((xx >= -0.5) & (xx <= w - 0.5))[None, :]
        if order == 1:
            y0 = jnp.floor(grid_y).astype(jnp.int32)
            x0 = jnp.floor(grid_x).astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, h - 1)
            x1 = jnp.minimum(x0 + 1, w - 1)
            fy = (grid_y - y0)[:, None, None]
            fx = (grid_x - x0)[None, :, None]
            out = (img[y0][:, x0] * (1 - fy) * (1 - fx)
                   + img[y0][:, x1] * (1 - fy) * fx
                   + img[y1][:, x0] * fy * (1 - fx)
                   + img[y1][:, x1] * fy * fx)
        else:
            y0 = jnp.round(grid_y).astype(jnp.int32)
            x0 = jnp.round(grid_x).astype(jnp.int32)
            out = img[y0][:, x0]
        return out * valid[..., None]

    return sample(image, 1), sample(mask, 0)


def _rot90_k(k, x):
    return jax.lax.switch(k, [lambda a: a,
                              lambda a: jnp.rot90(a, 1, (0, 1)),
                              lambda a: jnp.rot90(a, 2, (0, 1)),
                              lambda a: jnp.rot90(a, 3, (0, 1))], x)


def _reflect101(c, n):
    """Fold a continuous coordinate into [0, n-1] by mirroring about the edge
    pixel centers without repeating them (cv2 BORDER_REFLECT_101, what imgaug
    'reflect' maps to)."""
    if n == 1:
        return jnp.zeros_like(c)
    p = 2.0 * (n - 1)
    c = jnp.mod(c, p)
    return jnp.minimum(c, p - c)


def _rand_affine(key, image, mask, rotate_deg: float, shear_deg: float):
    """iaa.Affine(rotate=(-r, r), shear=(-s, s), order=1, mode='reflect')
    (reference train_util.py:42-49). skimage/imgaug forward matrix in (x, y)
    coords with unit scale: [[cos r, -sin(r+s)], [sin r, cos(r+s)]], applied
    about the image center. Output = inverse-mapped resample: bilinear +
    reflect-101 for the image, nearest + zero-fill for the mask (imgaug
    resamples segmentation maps with order=0, mode='constant')."""
    h, w = image.shape[0], image.shape[1]
    kr, ks = jax.random.split(key)
    r = jnp.deg2rad(jax.random.uniform(kr, (), minval=-rotate_deg,
                                       maxval=rotate_deg))
    s = jnp.deg2rad(jax.random.uniform(ks, (), minval=-shear_deg,
                                       maxval=shear_deg))
    # inverse of [[cos r, -sin(r+s)], [sin r, cos(r+s)]] (det = cos s)
    inv_det = 1.0 / jnp.cos(s)
    m00 = jnp.cos(r + s) * inv_det
    m01 = jnp.sin(r + s) * inv_det
    m10 = -jnp.sin(r) * inv_det
    m11 = jnp.cos(r) * inv_det
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy    # [H,1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx    # [1,W]
    src_x = m00 * xx + m01 * yy + cx                        # [H,W]
    src_y = m10 * xx + m11 * yy + cy

    # image: bilinear on reflect-folded coords
    fy = _reflect101(src_y, h)
    fx = _reflect101(src_x, w)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    img_out = (image[y0, x0] * (1 - wy) * (1 - wx)
               + image[y0, x1] * (1 - wy) * wx
               + image[y1, x0] * wy * (1 - wx)
               + image[y1, x1] * wy * wx)

    # mask: nearest, zero outside
    ny = jnp.round(src_y).astype(jnp.int32)
    nx = jnp.round(src_x).astype(jnp.int32)
    valid = ((ny >= 0) & (ny < h) & (nx >= 0) & (nx < w))
    msk_out = mask[jnp.clip(ny, 0, h - 1), jnp.clip(nx, 0, w - 1)]
    msk_out = msk_out * valid[..., None].astype(msk_out.dtype)
    return img_out, msk_out


def _rot90_nonsquare(key, k, image, mask):
    """Rot90 for H != W with imgaug's DEFAULT keep_size=True semantics
    (reference train_util.py:41 passes no keep_size, so the rotated [W, H]
    canvas is resized back to [H, W] -- aspect-distorting -- which makes the
    subsequent PadToFixedSize/CropToFixedSize pair no-ops): bilinear for the
    image, cv2-INTER_NEAREST for the segmentation map (imgaug resizes
    segmaps nearest). imgaug picks INTER_AREA when an axis shrinks; for this
    augmentation's distribution the bilinear/area difference is immaterial
    and bilinear (resize_linear, torch/cv2 half-pixel grid) is used. `key`
    is unused (keep_size resizing is deterministic) but kept so call-site
    RNG splitting is stable across configs."""
    del key
    from ..ops.resize import resize_linear
    h, w = image.shape[0], image.shape[1]
    # cv2 INTER_NEAREST on [W, H] -> [H, W]: src = floor(dst * src/dst)
    ys = jnp.minimum((jnp.arange(h) * w) // h, w - 1)
    xs = jnp.minimum((jnp.arange(w) * h) // w, h - 1)

    def odd_img(a, kk):
        rot = jnp.rot90(a, kk, (0, 1))          # [W, H, C]
        return resize_linear(rot[None], (h, w))[0].astype(a.dtype)

    def odd_msk(a, kk):
        rot = jnp.rot90(a, kk, (0, 1))
        return rot[ys][:, xs]

    img_branches = [lambda: image,
                    lambda: odd_img(image, 1),
                    lambda: jnp.rot90(image, 2, (0, 1)),
                    lambda: odd_img(image, 3)]
    msk_branches = [lambda: mask,
                    lambda: odd_msk(mask, 1),
                    lambda: jnp.rot90(mask, 2, (0, 1)),
                    lambda: odd_msk(mask, 3)]
    return jax.lax.switch(k, img_branches), jax.lax.switch(k, msk_branches)


def _color_jitter(key, image):
    """torchvision ColorJitter RandomChoice (train_util.py:59-64): one of
    brightness(0.2) / contrast(0.2) / saturation(0.2) / all(0.1). image in
    [0, 1]."""
    kc, kb, kk, ks, kh = jax.random.split(key, 5)
    choice = jax.random.randint(kc, (), 0, 4)
    b2 = jax.random.uniform(kb, (), minval=0.8, maxval=1.2)
    c2 = jax.random.uniform(kk, (), minval=0.8, maxval=1.2)
    s2 = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    b1 = jax.random.uniform(kb, (), minval=0.9, maxval=1.1)
    c1 = jax.random.uniform(kk, (), minval=0.9, maxval=1.1)
    s1 = jax.random.uniform(ks, (), minval=0.9, maxval=1.1)
    bf = jnp.where(choice == 0, b2, jnp.where(choice == 3, b1, 1.0))
    cf = jnp.where(choice == 1, c2, jnp.where(choice == 3, c1, 1.0))
    sf = jnp.where(choice == 2, s2, jnp.where(choice == 3, s1, 1.0))

    # brightness: scale; contrast: blend with the mean gray level;
    # saturation: blend with the per-pixel gray image (torchvision semantics)
    out = image * bf
    gray = jnp.tensordot(out, _GRAY_W, axes=[[-1], [0]])[..., None]
    mean_gray = jnp.mean(gray)
    out = mean_gray + (out - mean_gray) * cf
    out = gray + (out - gray) * sf
    return jnp.clip(out, 0.0, 1.0)


def augment_sample_2d(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray,
                      cfg: Aug2dConfig, mean=None, std=None):
    """image: [H, W, 3] float in [0,1]; mask: [H, W, C] (n-hot or raw).
    Returns (image_normalized, mask). `mean`/`std` ([C] arrays) override
    cfg.mean/cfg.std — the per-dataset path: the reference normalizes every
    dataset in a multi-`--ds` run with its OWN stats table
    (train_util.py:100-106), so the stats can't be baked into one static
    Aug2dConfig."""
    keys = jax.random.split(key, 11)
    if cfg.randscale > 0:
        do = jax.random.uniform(keys[0], ()) < cfg.crop_pad_prob
        img2, msk2 = _rand_crop_and_pad(keys[1], image, mask, cfg.randscale)
        image = jnp.where(do, img2, image)
        mask = jnp.where(do, msk2, mask)
    flip_l = jax.random.uniform(keys[2], ()) < cfg.fliplr_prob
    image = jnp.where(flip_l, image[:, ::-1], image)
    mask = jnp.where(flip_l, mask[:, ::-1], mask)
    flip_u = jax.random.uniform(keys[3], ()) < cfg.flipud_prob
    image = jnp.where(flip_u, image[::-1], image)
    mask = jnp.where(flip_u, mask[::-1], mask)
    do_rot = jax.random.uniform(keys[4], ()) < cfg.rot90_prob
    k = jnp.where(do_rot, jax.random.randint(keys[5], (), 1, 4), 0)
    if image.shape[0] == image.shape[1]:
        image = _rot90_k(k, image)
        mask = _rot90_k(k, mask)
    else:
        image, mask = _rot90_nonsquare(keys[8], k, image, mask)
    if cfg.do_affine:
        do_aff = jax.random.uniform(keys[10], ()) < cfg.affine_prob
        img2, msk2 = _rand_affine(keys[9], image, mask,
                                  cfg.affine_rotate_deg, cfg.affine_shear_deg)
        image = jnp.where(do_aff, img2, image)
        mask = jnp.where(do_aff, msk2, mask)
    if cfg.gray_alpha > 0:
        gray = jnp.tensordot(image, _GRAY_W, axes=[[-1], [0]])[..., None]
        image = (1 - cfg.gray_alpha) * image + cfg.gray_alpha * gray
    if cfg.colorjitter:
        image = _color_jitter(keys[6], image)
    if cfg.robust_aug:
        lo, hi = cfg.robust_aug_range
        rkeys = jax.random.split(keys[7], len(cfg.robust_aug))
        for rk, kind in zip(rkeys, cfg.robust_aug):
            f = jax.random.uniform(rk, (), minval=lo, maxval=hi)
            if kind == "brightness":
                image = jnp.clip(image * f, 0.0, 1.0)
            elif kind == "contrast":
                gray = jnp.tensordot(image, _GRAY_W, axes=[[-1], [0]])
                mg = jnp.mean(gray)
                image = jnp.clip(mg + (image - mg) * f, 0.0, 1.0)
            else:
                raise ValueError(f"unknown robust_aug {kind}")
    mean = jnp.asarray(cfg.mean) if mean is None else jnp.asarray(mean)
    std = jnp.asarray(cfg.std) if std is None else jnp.asarray(std)
    return (image - mean) / std, mask


def augment_batch_2d(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                     cfg: Aug2dConfig, mean=None, std=None):
    """vmapped per-sample augmentation; one fused XLA graph.

    `mean`/`std` override cfg's: [C] applies one table to the whole batch
    (the DA source loader's own stats, reference train2d.py:884-918), [B, C]
    applies per-sample tables (multi-dataset batches where each sample keeps
    its source dataset's stats, reference train_util.py:100-106)."""
    keys = jax.random.split(key, images.shape[0])
    if mean is not None and np.ndim(mean) == 2:
        return jax.vmap(
            lambda k, i, m, mu, sd: augment_sample_2d(k, i, m, cfg, mu, sd))(
            keys, images, masks, jnp.asarray(mean), jnp.asarray(std))
    return jax.vmap(lambda k, i, m: augment_sample_2d(k, i, m, cfg,
                                                      mean, std))(
        keys, images, masks)


# ---------------- 3D ----------------

def random_rot_flip_3d(key, image, mask):
    """reference RandomRotFlip (datasets3d.py:497-508): rot90 in the HW plane
    + random flips of H/W axes. image: [H, W, D, C]; mask raw [H, W, D]."""
    k1, k2, k3 = jax.random.split(key, 3)
    k = jax.random.randint(k1, (), 0, 4)
    image = _rot90_k(k, image)
    mask = _rot90_k(k, mask[..., None])[..., 0]
    fh = jax.random.uniform(k2, ()) < 0.5
    image = jnp.where(fh, image[::-1], image)
    mask = jnp.where(fh, mask[::-1], mask)
    fw = jax.random.uniform(k3, ()) < 0.5
    image = jnp.where(fw, image[:, ::-1], image)
    mask = jnp.where(fw, mask[:, ::-1], mask)
    return image, mask


def random_noise_3d(key, image, sigma: float = 0.1, clip: float = 0.2):
    """reference RandomNoise (datasets3d.py:568-580)."""
    noise = jnp.clip(sigma * jax.random.normal(key, image.shape), -clip, clip)
    return image + noise


def random_resized_crop_3d(key, images, masks, scale: float):
    """Batch-level RandomResizedCrop (reference datasets3d.py:611-665 /
    train3d.py:713-715): one random zoom factor for the whole batch, resample
    to the same shape. images: [B, H, W, D, C]; masks: [B, H, W, D, C]."""
    f = jax.random.uniform(key, (), minval=1.0 - scale, maxval=1.0 + scale)
    h, w, d = images.shape[1:4]
    # zoom via resize to scaled size then center-crop/pad back, all static:
    # approximate by resampling the center f-window (zoom-in) or full window
    # scaled (zoom-out) -- implemented as coordinate scaling like 2D.
    def lerp_axis(vol, axis, coords):
        # separable linear interpolation along one spatial axis
        n = vol.shape[axis]
        i0 = jnp.floor(coords).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        wshape = [1] * vol.ndim
        wshape[axis] = coords.shape[0]
        wgt = (coords - i0).reshape(wshape)
        a = jnp.take(vol, i0, axis=axis)
        b = jnp.take(vol, i1, axis=axis)
        return a * (1.0 - wgt) + b * wgt

    def resample(vol, order):
        grids = []
        valids = []
        for n in (h, w, d):
            coords = (jnp.arange(n) - (n - 1) / 2.0) * f + (n - 1) / 2.0
            valids.append((coords >= -0.5) & (coords <= n - 0.5))
            grids.append(jnp.clip(coords, 0, n - 1))
        gy, gx, gz = grids
        if order == 1:
            # trilinear (images), separable per axis
            out = lerp_axis(lerp_axis(lerp_axis(vol, 1, gy), 2, gx), 3, gz)
        else:
            # nearest (masks)
            iy = jnp.round(gy).astype(jnp.int32)
            ix = jnp.round(gx).astype(jnp.int32)
            iz = jnp.round(gz).astype(jnp.int32)
            out = vol[:, iy][:, :, ix][:, :, :, iz]
        v = (valids[0][:, None, None] & valids[1][None, :, None]
             & valids[2][None, None, :])
        return out * v[None, ..., None]
    return resample(images, 1), resample(masks, 0)

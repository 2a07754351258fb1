"""Fundus optic-disc-crop preprocessing: raw REFUGE-style frames -> the
disc-centered crops SegCrop consumes (crop position encoded in the filename).

Replaces reference MNet_DeepCDR/Step_1_Disc_Crop.py, which finds the optic
disc with a pretrained keras MNet U-Net (Model_DiscSeg_ORIGA.h5, not shipped)
and saves a DiscROI_size square crop around its centroid. Disc localization
here comes from one of three sources:

  * mask mode: the ground-truth mask's disc region centroid (training /
    validation sets ship annotations; identical crop geometry, no model),
  * model mode (--cpdir): a coarse segmentation from ANY checkpoint trained
    with this framework (our stand-in for the MNet detector) -- the frame is
    resized to --detsize (reference DiscSeg_size=640), the disc-probability
    channel is thresholded, largest-component+fill-holes cleaned (reference
    mnet_utils.BW_img), and its centroid scaled back,
  * center mode: resize to --detsize and crop at the frame center (reference
    auto_crop=False branch for externally pre-centered datasets,
    Step_1_Disc_Crop.py:108-113).

Crop geometry and naming exactly mirror the reference:
  * clamped square crop (mnet_utils.disc_crop, Step_1_Disc_Crop.py:117),
  * '{stem}_{roi}_{x0},{y0}.png' (Step_1_Disc_Crop.py:124) -- SegCrop parses
    the trailing 'x,y' as the crop position (dataloaders/datasets2d.py:440),
  * raw annotation remap 255/128/0 -> 3-channel 0/255 disc(+cup)/cup
    (Step_1_Disc_Crop.py:84-93).

Usage:
  python -m segtran_tpu.cli.prep_fundus --images raw/images --masks raw/masks \
      --out data/fundus/mytrain --roi 576
  python -m segtran_tpu.cli.prep_fundus --images raw/images --out data/... \
      --cpdir model/job --iter 8000 --bb eff-b4 --translayers 3 ...
"""
from __future__ import annotations

import argparse
import os
from glob import glob
from typing import Optional, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def largest_region_fill(binary: np.ndarray) -> np.ndarray:
    """Keep the largest connected component and fill its holes (reference
    mnet_utils.BW_img:38-50, skimage label/regionprops + binary_fill_holes)."""
    import cv2
    from scipy.ndimage import binary_fill_holes
    n, comp = cv2.connectedComponents(binary.astype(np.uint8))
    if n <= 1:
        return binary.astype(bool)
    largest = 1 + np.argmax([(comp == i).sum() for i in range(1, n)])
    return binary_fill_holes(comp == largest)


def disc_crop(img: np.ndarray, roi: int, cx: int, cy: int
              ) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Clamped roi x roi crop centered at (cx, cy) (reference
    mnet_utils.disc_crop:73-97). Returns (crop, (x0, x1, y0, y1))."""
    half = roi // 2
    c = [cx - half, cx + half, cy - half, cy + half]
    if c[0] < 0:
        c[0], c[1] = 0, roi
    if c[2] < 0:
        c[2], c[3] = 0, roi
    if c[1] > img.shape[0]:
        c[1] = img.shape[0]
        c[0] = c[1] - roi
    if c[3] > img.shape[1]:
        c[3] = img.shape[1]
        c[2] = c[3] - roi
    return img[c[0]:c[1], c[2]:c[3]], (c[0], c[1], c[2], c[3])


def map_raw_fundus_label(raw: np.ndarray) -> np.ndarray:
    """Raw REFUGE annotation (255 bg / 128 disc-excl-cup / 0 cup) -> the
    3-channel crop-mask format (ch0: disc incl. cup, ch1: cup, as 0/255;
    reference Step_1_Disc_Crop.py:84-93)."""
    if raw.ndim == 3:
        raw = raw[:, :, 0]
    out = np.zeros(raw.shape + (3,), np.uint8)
    out[raw < 200, 0] = 255
    out[raw < 100, 1] = 255
    return out


def center_from_mask(raw_label: np.ndarray) -> Tuple[int, int]:
    """Disc centroid from the ground-truth annotation."""
    if raw_label.ndim == 3:
        raw_label = raw_label[:, :, 0]
    disc = largest_region_fill(raw_label < 200)
    xs, ys = np.nonzero(disc)
    if xs.size == 0:
        return raw_label.shape[0] // 2, raw_label.shape[1] // 2
    return int(xs.mean()), int(ys.mean())


def center_from_model(model_fn, img: np.ndarray, detsize: int
                      ) -> Tuple[int, int]:
    """Disc centroid from a coarse model segmentation of the resized frame
    (replaces the MNet DiscSeg predict + BW_img + regionprops chain,
    Step_1_Disc_Crop.py:99-106)."""
    import cv2
    small = cv2.resize(img, (detsize, detsize),
                       interpolation=cv2.INTER_LINEAR)
    probs = np.asarray(model_fn(small.astype(np.float32) / 255.0))
    disc_p = probs[..., 1] if probs.shape[-1] >= 2 else probs[..., 0]
    thr = 0.5 if disc_p.max() > 0.5 else disc_p.max() / 2.0   # BW_img:39-41
    disc = largest_region_fill(disc_p > thr)
    xs, ys = np.nonzero(disc)
    if xs.size == 0:
        cx = cy = detsize // 2
    else:
        cx, cy = xs.mean(), ys.mean()
    return (int(cx * img.shape[0] / detsize),
            int(cy * img.shape[1] / detsize))


def _build_model_fn(args):
    """Coarse segmentation forward from a framework checkpoint, via the same
    factory/loader the eval CLI uses."""
    import jax
    import jax.numpy as jnp
    from ..nn.init import init_with_reference_schemes
    from ..train.checkpoint import load_checkpoint, merge_params
    from .test2d import build_model
    from .train2d import TASK_SETTINGS

    task = dict(TASK_SETTINGS["fundus"])
    if args.patch_size:
        v = tuple(int(x) for x in str(args.patch_size).split(","))
        task["patch_size"] = v * 2 if len(v) == 1 else v
    model, cfg = build_model(args, task)
    patch = tuple(task["patch_size"])
    example = jnp.zeros((1,) + patch + (3,), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, example)
    payload = load_checkpoint(
        os.path.join(args.cpdir, f"iter_{args.iter_num}"), cfg)
    params = merge_params(params, payload.get("params", {}))
    bstats = merge_params(rest.get("batch_stats", {}),
                          payload.get("batch_stats", {}))
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    # one upload: host-numpy checkpoint leaves as a jit argument would
    # re-transfer per image
    variables = jax.device_put(variables)
    mean = jnp.asarray((0.5, 0.5, 0.5))
    std = jnp.asarray((0.25, 0.25, 0.25))

    # variables as jit argument (closed-over params become HLO constants ->
    # axon remote-compile HTTP 413 at large-backbone scale)
    @jax.jit
    def _model_fn(variables, image):
        x = (image - mean) / std
        logits = model.apply(variables, x[None], train=False)
        probs = jax.nn.sigmoid(logits[0])
        return jax.image.resize(probs, image.shape[:2] + probs.shape[-1:],
                                "linear")

    return lambda image: _model_fn(variables, image)


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True, help="raw fundus image dir")
    p.add_argument("--masks", default=None,
                   help="raw annotation dir (255/128/0 bmp or png); enables "
                        "mask-mode localization and mask-crop output")
    p.add_argument("--out", required=True,
                   help="output dataset dir (images/ + masks/ created)")
    p.add_argument("--roi", type=int, default=576,
                   help="crop size (reference discROI_size, "
                        "Step_1_Disc_Crop.py:21; released crops use 576)")
    p.add_argument("--mode", default="auto",
                   choices=["auto", "mask", "model", "center"],
                   help="disc localization source (auto: mask if --masks, "
                        "else model if --cpdir, else center)")
    p.add_argument("--detsize", type=int, default=640,
                   help="detection/center resize (reference DiscSeg_size)")
    # model-mode flags (mirror cli/test2d.py so any checkpoint loads)
    p.add_argument("--cpdir", default=None)
    p.add_argument("--iter", dest="iter_num", type=int, default=None)
    p.add_argument("--net", default="segtran")
    p.add_argument("--bb", dest="backbone_type", default="eff-b4")
    p.add_argument("--translayers", dest="num_translayers", type=int,
                   default=3)
    p.add_argument("--layercompress", dest="translayer_compress_ratios",
                   default=None)
    p.add_argument("--attractors", dest="num_attractors", type=int,
                   default=256)
    p.add_argument("--patchsize", dest="patch_size", default=None)
    p.add_argument("--modes", dest="num_modes", type=int, default=-1)
    p.add_argument("--bf16", action="store_true")
    return p


def main(argv=None):
    from PIL import Image

    args = build_argparser().parse_args(argv)
    mode = args.mode
    if mode == "auto":
        mode = ("mask" if args.masks else
                "model" if args.cpdir else "center")
    if mode == "model" and not (args.cpdir and args.iter_num is not None):
        raise ValueError("model mode needs --cpdir and --iter")

    img_dir = args.images
    files = sorted(f for f in os.listdir(img_dir)
                   if f.lower().endswith(IMG_EXTS))
    if not files:
        raise FileNotFoundError(f"no images under {img_dir}")
    out_img = os.path.join(args.out, "images")
    os.makedirs(out_img, exist_ok=True)
    out_mask = None
    if args.masks:
        out_mask = os.path.join(args.out, "masks")
        os.makedirs(out_mask, exist_ok=True)

    model_fn = _build_model_fn(args) if mode == "model" else None

    written = []
    for i, name in enumerate(files):
        stem = os.path.splitext(name)[0]
        img = np.asarray(Image.open(os.path.join(img_dir, name))
                         .convert("RGB"))
        raw_label = None
        if args.masks:
            for ext in (".bmp", ".png", ".jpg"):
                mp = os.path.join(args.masks, stem + ext)
                if os.path.exists(mp):
                    raw_label = np.asarray(Image.open(mp))
                    break
            if raw_label is None:
                raise FileNotFoundError(f"no mask for {name} in "
                                        f"{args.masks}")

        if mode == "mask":
            cx, cy = center_from_mask(raw_label)
        elif mode == "model":
            cx, cy = center_from_model(model_fn, img, args.detsize)
        else:
            # reference manual path: resize the frame to detsize, center crop
            import cv2
            img = cv2.resize(img, (args.detsize, args.detsize),
                             interpolation=cv2.INTER_LINEAR)
            if raw_label is not None:
                raw_label = cv2.resize(
                    raw_label, (args.detsize, args.detsize),
                    interpolation=cv2.INTER_NEAREST)
            cx = cy = args.detsize // 2

        crop, coord = disc_crop(img, args.roi, cx, cy)
        fname = "{}_{}_{},{}.png".format(stem, args.roi, coord[0], coord[2])
        Image.fromarray(crop.astype(np.uint8)).save(
            os.path.join(out_img, fname))
        if raw_label is not None:
            label3 = map_raw_fundus_label(raw_label)
            mcrop, _ = disc_crop(label3, args.roi, cx, cy)
            Image.fromarray(mcrop.astype(np.uint8)).save(
                os.path.join(out_mask, fname))
        written.append(fname)
        print(f"[{i + 1}/{len(files)}] {name} -> {fname} "
              f"(center {cx},{cy})")
    print(f"wrote {len(written)} crops -> {out_img}")
    return written


if __name__ == "__main__":
    main()

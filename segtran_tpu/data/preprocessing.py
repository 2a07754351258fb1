"""Offline preprocessing CLIs: raw scans -> normalized h5 volumes.

Parity targets (reference code/dataloaders/):
  * brats_processing.py:53-138 -- BraTS nii.gz (flair/t1ce/t1/t2 [+seg]) ->
    h5 {'image' [4,H,W,D] fp32, 'label' [H,W,D] u8}: crop to the nonzero
    bounding box (training only; optional mask-guided localization), per-
    modality z-normalization over NONZERO voxels of the crop, zeros kept 0,
  * atria_processing.py:12-72 -- lgemri/laendo nrrd -> h5 with label==255
    binarization and mask-guided localization,
  * msd_processing.py:12-66 -- MSD nii.gz -> h5.

nibabel / pynrrd are optional; functions raise a clear error when missing.
Usage: python -m segtran_tpu.data.preprocessing brats --root <dir>
"""
from __future__ import annotations

import argparse
import os
from glob import glob
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

BRATS_MODALITIES = ("flair", "t1ce", "t1", "t2")


def _nonzero_bbox(arr: np.ndarray, axes_offset: int = 0):
    nz = np.nonzero(arr)
    return [(int(nz[i + axes_offset].min()), int(nz[i + axes_offset].max()))
            for i in range(3)]


def _localized_bbox(labels: np.ndarray, output_size, shape,
                    rng: np.random.RandomState):
    (minx, maxx), (miny, maxy), (minz, maxz) = _nonzero_bbox(labels)
    H, W, D = shape
    px = max(output_size[0] - (maxx - minx), 0) // 2
    py = max(output_size[1] - (maxy - miny), 0) // 2
    pz = max(output_size[2] - (maxz - minz), 0) // 2
    minx = max(minx - rng.randint(10, 20) - px, 0)
    maxx = min(maxx + rng.randint(10, 20) + px, H)
    miny = max(miny - rng.randint(10, 20) - py, 0)
    maxy = min(maxy + rng.randint(10, 20) + py, W)
    minz = max(minz - rng.randint(5, 10) - pz, 0)
    maxz = min(maxz + rng.randint(5, 10) + pz, D)
    return (minx, maxx), (miny, maxy), (minz, maxz)


def normalize_nonzero(image_mm: np.ndarray,
                      stats_crop: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-modality z-norm over nonzero voxels; zeros stay zero
    (brats_processing.py:121-131)."""
    if stats_crop is None:
        stats_crop = image_mm
    nonzero_mask = image_mm > 0
    out = np.empty_like(image_mm)
    for m in range(image_mm.shape[0]):
        nz = stats_crop[m][stats_crop[m] > 0]
        mean, std = float(nz.mean()), float(nz.std())
        out[m] = (image_mm[m] - mean) / std
    return out * nonzero_mask


def convert_brats_case(case_dir: str, out_path: Optional[str] = None,
                       is_training: bool = True,
                       do_localization: bool = False, seed: int = 0):
    import nibabel as nib
    name = os.path.basename(case_dir.rstrip("/"))
    mods = []
    for mod in BRATS_MODALITIES:
        img = nib.load(os.path.join(case_dir, f"{name}_{mod}.nii.gz"))
        mods.append(np.asarray(img.get_fdata(), np.float32))
    image_mm = np.stack(mods, axis=0)
    if is_training:
        seg = nib.load(os.path.join(case_dir, f"{name}_seg.nii.gz"))
        labels = np.asarray(seg.get_fdata(), np.uint8)
    else:
        labels = np.zeros(image_mm.shape[1:], np.uint8)

    rng = np.random.RandomState(seed)
    if is_training and do_localization:
        bb = _localized_bbox(labels, (112, 112, 96), image_mm.shape[1:], rng)
    else:
        bb = _nonzero_bbox(image_mm, axes_offset=1)
    (x0, x1), (y0, y1), (z0, z1) = bb
    crop = image_mm[:, x0:x1, y0:y1, z0:z1]
    if is_training:
        image_mm = crop
        labels = labels[x0:x1, y0:y1, z0:z1]
    image_mm = normalize_nonzero(image_mm, crop)

    out_path = out_path or os.path.join(case_dir, name + ".h5")
    with h5py.File(out_path, "w") as f:
        f.create_dataset("image", data=image_mm, compression="gzip")
        f.create_dataset("label", data=labels, compression="gzip")
    return out_path


def convert_brats_root(root: str, seed: int = 0):
    is_training = "validation" not in root.lower()
    cases = sorted(d for d in os.listdir(root)
                   if os.path.isdir(os.path.join(root, d)))
    outs = []
    for c in cases:
        outs.append(convert_brats_case(os.path.join(root, c),
                                       is_training=is_training, seed=seed))
    return outs


def convert_atria_root(root: str, output_size=(112, 112, 80), seed: int = 0):
    import nrrd
    is_training = "validation" not in root.lower()
    rng = np.random.RandomState(seed)
    outs = []
    for image_path in sorted(glob(os.path.join(root, "*/lgemri.nrrd"))):
        image, _ = nrrd.read(image_path)
        labels, _ = nrrd.read(image_path.replace("lgemri.nrrd",
                                                 "laendo.nrrd"))
        image = image.astype(np.float32)
        labels = (labels == 255).astype(np.uint8)
        if is_training:
            bb = _localized_bbox(labels, output_size, labels.shape, rng)
            (x0, x1), (y0, y1), (z0, z1) = bb
            image = image[x0:x1, y0:y1, z0:z1]
            labels = labels[x0:x1, y0:y1, z0:z1]
        image = (image - image.mean()) / (image.std() + 1e-8)
        out_path = os.path.join(os.path.dirname(image_path), "case.h5")
        with h5py.File(out_path, "w") as f:
            f.create_dataset("image", data=image[None], compression="gzip")
            f.create_dataset("label", data=labels, compression="gzip")
        outs.append(out_path)
    return outs


def convert_msd_root(root: str, seed: int = 0):
    import nibabel as nib
    outs = []
    img_dir = os.path.join(root, "imagesTr")
    lab_dir = os.path.join(root, "labelsTr")
    for p in sorted(glob(os.path.join(img_dir, "*.nii.gz"))):
        name = os.path.basename(p).replace(".nii.gz", "")
        image = np.asarray(nib.load(p).get_fdata(), np.float32)
        if image.ndim == 3:
            image = image[None]
        else:
            image = image.transpose(3, 0, 1, 2)
        lp = os.path.join(lab_dir, os.path.basename(p))
        labels = (np.asarray(nib.load(lp).get_fdata(), np.uint8)
                  if os.path.isfile(lp)
                  else np.zeros(image.shape[1:], np.uint8))
        image = normalize_nonzero(image)
        out_path = os.path.join(root, name + ".h5")
        with h5py.File(out_path, "w") as f:
            f.create_dataset("image", data=image, compression="gzip")
            f.create_dataset("label", data=labels, compression="gzip")
        outs.append(out_path)
    return outs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=["brats", "atria", "msd"])
    p.add_argument("--root", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    fn = {"brats": convert_brats_root, "atria": convert_atria_root,
          "msd": convert_msd_root}[args.task]
    outs = fn(args.root, seed=args.seed)
    print(f"converted {len(outs)} cases")


if __name__ == "__main__":
    main()

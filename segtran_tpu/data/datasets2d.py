"""Host-side 2D datasets: pre-cropped (SegCrop) and whole-image (SegWhole).

Parity targets (reference code/dataloaders/datasets2d.py):
  * SegCrop (:329-545): images pre-cropped around the optic disc with the crop
    position encoded in the filename ("n0107_800_591,206.png"), list files
    (train/test/all, train-{k}shot for few-shot DA), 85/15 split creation,
    uncropped-size bookkeeping for full-frame output,
  * SegWhole (:548-715): whole images resized to a fixed size,
  * localize() (:289-311): mask-guided crop with random margins,
  * load_mask binarization quirk (:313-327).

Design differences (TPU-first): samples come out as fixed-size float32 numpy
(image resized at load), augmentation is NOT applied here -- it runs on-device
(see .augment) inside the jitted train step. The reference's DataLoader worker
pool is replaced by a thread-pool prefetcher (.pipeline).
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def load_mask(mask_path: str, binarize: bool) -> np.ndarray:
    """reference datasets2d.py:313-327."""
    mask = np.array(Image.open(mask_path, "r"))
    if binarize:
        mask = mask.copy()
        mask[mask < 255] = 0
        if mask.ndim == 2:
            mask = np.tile(mask, (3, 1, 1)).transpose([1, 2, 0])
    return mask


def localize(image: np.ndarray, mask: np.ndarray,
             min_output_size, rng: np.random.RandomState):
    """Mask-guided crop with random zero margins (reference :289-311)."""
    if isinstance(min_output_size, int):
        h = w = min_output_size
    else:
        h, w = min_output_size
    nz = np.nonzero(mask)
    minx, maxx = np.min(nz[0]), np.max(nz[0])
    miny, maxy = np.min(nz[1]), np.max(nz[1])
    px = max(h - (maxx - minx), 0) // 2
    py = max(w - (maxy - miny), 0) // 2
    minx = max(minx - rng.randint(10, 20) - px, 0)
    maxx = min(maxx + rng.randint(10, 20) + px, h)
    miny = max(miny - rng.randint(10, 20) - py, 0)
    maxy = min(maxy + rng.randint(10, 20) + py, w)
    return image[minx:maxx, miny:maxy], mask[minx:maxx, miny:maxy]


def reshape_mask(mask: np.ndarray, dim: int, value: int = 255,
                 shape: Optional[str] = None) -> np.ndarray:
    """Mask-shape bias probe (reference datasets2d.py:253-270): replace one
    class's region with its minimum-area rectangle to test whether the model
    exploits mask shape. Requires cv2."""
    if shape is None:
        return mask
    import cv2
    fg = np.nonzero(mask[:, :, dim] == value)
    if len(fg[0]) == 0:        # no region of that value: nothing to reshape
        return mask
    fg_xy = np.stack(fg[::-1], axis=1).astype(np.float32)
    if shape != "rectangle":
        raise ValueError(shape)
    points = cv2.boxPoints(cv2.minAreaRect(fg_xy)).astype(int)
    mask2 = np.zeros(mask.shape)
    cv2.fillPoly(mask2, [points], value)
    out = mask.copy()
    out[:, :, dim] = mask2[:, :, 0]
    return out


def _read_list(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def create_split_lists(base_dir: str, frac_or_shot=0.85,
                       seed: Optional[int] = None):
    """Create all/train/test list files from images/ (reference :500-545)."""
    img_dir = os.path.join(base_dir, "images")
    idx2files = {}
    for fn in sorted(os.listdir(img_dir)):
        img_idx = fn.split("_")[0]
        idx2files.setdefault(img_idx, []).append(os.path.join("images", fn))
    indices = list(idx2files.keys())
    for k in indices:
        idx2files[k] = sorted(idx2files[k])
    with open(os.path.join(base_dir, "all.list"), "w") as f:
        for k in indices:
            f.write("\n".join(idx2files[k]) + "\n")
    rng = np.random.RandomState(seed)
    perm = rng.permutation(indices)
    if isinstance(frac_or_shot, int):
        train_len = frac_or_shot
        suffix = f"-{frac_or_shot}shot"
    else:
        train_len = int(np.floor(len(indices) * frac_or_shot))
        suffix = ""
    train_idx, test_idx = perm[:train_len], perm[train_len:]
    for name, idxs in (("train", train_idx), ("test", test_idx)):
        with open(os.path.join(base_dir, f"{name}{suffix}.list"), "w") as f:
            for k in sorted(idxs):
                f.write("\n".join(idx2files[k]) + "\n")


def load_gamma_labels(gamma_label_path: str) -> dict:
    """GAMMA-challenge image-level glaucoma labels (reference
    datasets2d.py:272-287): CSV with a header then rows 'name,onehot...',
    e.g. '0002,1,0,0' -> {'0002': 0} (argmax of the one-hot columns)."""
    import csv
    image2label = {}
    with open(gamma_label_path) as f:
        reader = csv.reader(f)
        next(reader)   # header
        for row in reader:
            onehot = np.array([int(v) for v in row[1:]])
            image2label[row[0]] = int(onehot.argmax())
    return image2label


@dataclass
class SegCrop:
    """Pre-cropped images; crop position parsed from the filename."""
    base_dir: str
    split: str = "train"                 # train | test | all
    sample_num: int = -1                 # >0: few-shot (train-{k}shot.list)
    mask_num_classes: int = 2
    has_mask: bool = True
    ds_weight: float = 1.0
    binarize: bool = False
    train_loc_prob: float = 0.0
    chosen_size: Optional[int] = None
    uncropped_size: Tuple[int, int] | int = -1
    min_output_size: Optional[Tuple[int, int]] = None
    out_size: Optional[Tuple[int, int]] = None  # resize at load (aug target)
    # image-level class labels CSV (GAMMA challenge, reference
    # datasets2d.py:272-287); None auto-detects glaucoma_label.csv
    cls_label_csv: Optional[str] = None
    # mask-shape bias probe: 'rectangle' replaces the value-255 region of
    # channel 0 with its min-area rectangle at load (reference --reshape,
    # test2d.py:140-142 / datasets2d.py:253-270 — declared there but its
    # transform wiring is commented out, test2d.py:377-381; wired live here)
    reshape_mask_type: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        base = self.base_dir
        csv_path = self.cls_label_csv
        if csv_path is None:
            cand = os.path.join(base, "glaucoma_label.csv")
            csv_path = cand if os.path.isfile(cand) else ""
        self.image2label = load_gamma_labels(csv_path) if csv_path else None
        if self.sample_num > 0:
            train_list = os.path.join(base, f"train-{self.sample_num}shot.list")
            if not os.path.isfile(train_list):
                create_split_lists(base, self.sample_num, self.seed)
        else:
            train_list = os.path.join(base, "train.list")
            if not os.path.isfile(train_list):
                create_split_lists(base, 0.85, self.seed)
        list_path = {"train": train_list,
                     "test": os.path.join(base, "test.list"),
                     "all": os.path.join(base, "all.list")}[self.split]
        items = _read_list(list_path)
        if self.chosen_size:
            items = [n for n in items if f"_{self.chosen_size}_" in n]
        self.image_list = items
        self._rng = np.random.RandomState(self.seed)

    def __len__(self):
        return len(self.image_list)

    def _cls_label(self, name: str) -> int:
        """Image-level label lookup: exact stem first, then the leading
        token (cropped files carry crop-position suffixes)."""
        if self.image2label is None:
            return -1
        stem = os.path.splitext(os.path.basename(name))[0]
        if stem in self.image2label:
            return self.image2label[stem]
        return self.image2label.get(stem.split("_")[0], -1)

    def __getitem__(self, idx: int) -> dict:
        name = self.image_list[idx]
        m = re.search(r"(\d+),(\d+)", name)
        crop_pos = np.array([int(m.group(1)), int(m.group(2))]) \
            if m else np.array([0, 0])
        image = np.array(Image.open(os.path.join(self.base_dir, name), "r"))
        if image.ndim == 2:
            # grayscale (e.g. OCT duke): replicate to 3 channels
            image = np.stack([image] * 3, axis=-1)
        if image.shape[-1] == 4:
            image = image[..., :3]  # drop alpha
        if self.has_mask:
            mask_path = os.path.join(self.base_dir,
                                     name.replace("images", "masks"))
            mask = load_mask(mask_path, self.binarize)
            if self.reshape_mask_type:
                m3 = mask if mask.ndim == 3 else mask[..., None]
                mask = reshape_mask(m3, 0, 255,
                                    shape=self.reshape_mask_type)
        else:
            mask = np.zeros(image.shape[:2] + (1,), np.uint8)
        unscaled_size = np.array(image.shape[:2])
        if self.split == "train" and self.train_loc_prob > 0 \
                and self._rng.random() < self.train_loc_prob:
            image, mask = localize(image, mask, self.min_output_size,
                                   self._rng)
        if mask.ndim == 2:
            mask = mask[..., None]
        if self.out_size is not None and image.shape[:2] != tuple(self.out_size):
            image = np.array(Image.fromarray(image).resize(
                (self.out_size[1], self.out_size[0]), Image.BILINEAR))
            mask = np.array(Image.fromarray(mask.squeeze(-1) if
                                            mask.shape[-1] == 1 else mask)
                            .resize((self.out_size[1], self.out_size[0]),
                                    Image.NEAREST))
            if mask.ndim == 2:
                mask = mask[..., None]
        return {
            "image": image.astype(np.float32) / 255.0,
            "mask": mask,
            "index": idx,
            "image_path": os.path.join(self.base_dir, name),
            "crop_pos": crop_pos,
            "unscaled_size": unscaled_size,
            "uncropped_size": np.asarray(self.uncropped_size),
            "weight": np.float32(self.ds_weight),
            # image-level glaucoma grade (-1 when no label CSV / unlisted)
            "cls_label": np.int32(self._cls_label(name)),
        }


@dataclass
class SegWhole(SegCrop):
    """Whole images (polyp/OCT); no crop position, images resized to out_size
    (reference :548-715)."""

    def __getitem__(self, idx: int) -> dict:
        sample = super().__getitem__(idx)
        sample["crop_pos"] = np.array([0, 0])
        return sample


class ConcatDataset:
    """Multiple datasets as one (reference uses torch ConcatDataset,
    train2d.py:844-849)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx):
        ds_i = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        sample = self.datasets[ds_i][idx - int(self.offsets[ds_i])]
        # tag the source dataset so the train step can normalize each sample
        # with its own dataset's stats (reference train_util.py:100-106
        # builds one transform per ds_name; a concatenated loader here means
        # the stats lookup must ride with the sample instead)
        return dict(sample, ds_idx=np.int32(ds_i))

"""Host-side 3D datasets over preprocessed h5 volumes.

Parity targets (reference code/dataloaders/datasets3d.py):
  * BratsSet (:331-454): per-case h5 with 'image' [4, H, W, D] and 'label'
    [H, W, D]; optional per-case weight by tumor size; list files,
  * AtriaSet (:147-208) / MSDSet (:210-329): single-modality variants,
  * CenterCrop / RandomCrop (:456-545): pad-to-size then crop,
  * ToTensor is replaced by channels-last numpy.

Augmentation (rot/flip/noise/randscale) runs on-device (.augment).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def pad_to_size(image: np.ndarray, label: Optional[np.ndarray],
                size: Sequence[int]):
    """Symmetric zero-pad spatial dims up to `size` (reference :470-481)."""
    pads = []
    sp = image.shape[:3]
    for s, t in zip(sp, size):
        p = max(t - s, 0)
        pads.append((p // 2, p - p // 2))
    if any(p != (0, 0) for p in pads):
        image = np.pad(image, pads + [(0, 0)] * (image.ndim - 3))
        if label is not None:
            label = np.pad(label, pads)
    return image, label


def center_crop(image: np.ndarray, label: Optional[np.ndarray],
                size: Sequence[int]):
    image, label = pad_to_size(image, label, size)
    starts = [(s - t) // 2 for s, t in zip(image.shape[:3], size)]
    sl = tuple(slice(st, st + t) for st, t in zip(starts, size))
    return image[sl], (label[sl] if label is not None else None)


def random_crop(image: np.ndarray, label: Optional[np.ndarray],
                size: Sequence[int], rng: np.random.RandomState):
    image, label = pad_to_size(image, label, size)
    starts = [rng.randint(0, s - t + 1) for s, t in
              zip(image.shape[:3], size)]
    sl = tuple(slice(st, st + t) for st, t in zip(starts, size))
    return image[sl], (label[sl] if label is not None else None)


def _read_list(path):
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


@dataclass
class BratsSet:
    """BraTS h5 volumes -> channels-last samples {image [H,W,D,4],
    label [H,W,D] raw ints, weight}."""
    base_dir: str
    split: str = "train"
    mode: str = "train"            # train: random crop; else: whole volume
    crop_size: Optional[Tuple[int, int, int]] = None
    binarize: bool = False
    remap_label4: bool = True      # BraTS raw ET label 4 -> 3 (:404)
    ds_weight: float = 1.0
    weight_by_size: bool = False   # beyond-reference tumor-size weighting
    seed: int = 0
    image_key: str = "image"
    label_key: str = "label"
    # choose one modality channel (-1 = all; reference datasets3d.py:218-226,
    # 275-276) and/or permute the spatial axes (reference :410-413)
    chosen_modality: int = -1
    xyz_permute: Optional[Tuple[int, int, int]] = None

    def __post_init__(self):
        lp = os.path.join(self.base_dir, f"{self.split}.list")
        if not os.path.isfile(lp) and self.split == "all":
            # fall back to globbing h5 files
            self.case_list = sorted(
                f for f in os.listdir(self.base_dir) if f.endswith(".h5"))
        else:
            self.case_list = _read_list(lp)
        self._rng = np.random.RandomState(self.seed)

    @property
    def num_modalities(self) -> int:
        """Modality count of the stored volumes (0 = single-channel file),
        probed from case 0 like the reference (datasets3d.py:258-263)."""
        if not hasattr(self, "_num_modalities"):
            with h5py.File(self._path(self.case_list[0]), "r") as f:
                shape = f[self.image_key].shape
            self._num_modalities = 0 if len(shape) == 3 else min(shape)
        return self._num_modalities

    def __len__(self):
        return len(self.case_list)

    def _path(self, name):
        p = os.path.join(self.base_dir, name)
        if not p.endswith(".h5"):
            p += ".h5"
        return p

    def __getitem__(self, idx):
        with h5py.File(self._path(self.case_list[idx]), "r") as f:
            image = np.asarray(f[self.image_key], np.float32)
            label = np.asarray(f[self.label_key]) if self.label_key in f \
                else None
        if image.ndim == 4 and image.shape[0] <= 8 \
                and image.shape[0] < image.shape[-1]:
            # stored channels-first [C, H, W, D] -> channels-last (reference
            # BraTS h5; MSD h5 from nibabel is already modality-last)
            image = image.transpose(1, 2, 3, 0)
        elif image.ndim == 3:
            image = image[..., None]
        if self.chosen_modality != -1 and image.shape[-1] > 1:
            image = image[..., self.chosen_modality:self.chosen_modality + 1]
        if self.xyz_permute is not None:
            perm = tuple(self.xyz_permute)
            image = image.transpose(perm + (3,))
            if label is not None:
                label = label.transpose(perm)
        if label is not None:
            if self.binarize:
                # whole-tumor / LA segmentation (reference :400-401)
                label = (label >= 1).astype(np.uint8)
            elif self.remap_label4:
                # BraTS raw labels are {0,1,2,4}; brats_map_label expects
                # {0,1,2,3} (reference :403-404: mask -= (mask == 4))
                label = (label - (label == 4)).astype(label.dtype)
        if self.mode == "train" and self.crop_size is not None:
            image, label = random_crop(image, label, self.crop_size,
                                       self._rng)
        weight = self.ds_weight
        if self.weight_by_size and label is not None:
            # beyond-reference option: scale sample weight with foreground
            # fraction (saturating at a nominal 1% tumor volume), so empty /
            # near-empty crops contribute less.
            frac = float((label > 0).mean())
            weight = weight * (0.5 + 0.5 * min(frac / 0.01, 1.0))
        return {
            "image": image,
            "label": (label if label is not None
                      else np.zeros(image.shape[:3], np.uint8)),
            "index": idx,
            "weight": np.float32(weight),
            "name": self.case_list[idx],
        }


@dataclass
class AtriaSet(BratsSet):
    """Left-atrium h5 volumes (single modality; reference :147-208)."""
    binarize: bool = True


@dataclass
class MSDSet(BratsSet):
    """Medical Segmentation Decathlon h5 volumes (reference :210-329).
    No BraTS label remap -- MSD label spaces are task-specific. When list
    files are absent, splits are created from the decathlon dataset.json
    (85/15 train/test, reference create_file_list :294-329)."""
    remap_label4: bool = False
    train_test_split: float = 0.85

    def __post_init__(self):
        lp = os.path.join(self.base_dir, f"{self.split}.list")
        jp = os.path.join(self.base_dir, "dataset.json")
        if not os.path.isfile(lp) and os.path.isfile(jp):
            self.create_file_list(jp)
        super().__post_init__()

    def create_file_list(self, json_path: str):
        """Split the decathlon training roster into train/test/all lists
        (reference :294-329; the official test set has no ground truth)."""
        import json as _json
        with open(json_path) as fp:
            meta = _json.load(fp)
        files = []
        for entry in meta["training"][:meta["numTraining"]]:
            name = entry["image"].replace(".nii.gz", ".h5")
            if name.startswith("./"):
                name = name[2:]
            files.append(os.path.basename(name))
        order = np.random.RandomState(self.seed).permutation(len(files))
        n_train = int(np.floor(len(files) * self.train_test_split))
        splits = {"train": sorted(files[i] for i in order[:n_train]),
                  "test": sorted(files[i] for i in order[n_train:]),
                  "all": sorted(files)}
        for split, names in splits.items():
            with open(os.path.join(self.base_dir, f"{split}.list"),
                      "w") as f:
                f.write("\n".join(names) + "\n")

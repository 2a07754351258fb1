"""Prediction post-processing.

remove_fragmentary_segs: keep only the largest connected components
(reference test_util2d.py:267-289 keeps the top-2 by area via cv2)."""
from __future__ import annotations

import numpy as np


def remove_fragmentary_segs(mask: np.ndarray, keep_top: int = 2) -> np.ndarray:
    """mask: [H, W] binary/integer. Zeroes all but the keep_top largest
    nonzero connected components (4-connectivity like cv2 default 8? the
    reference uses cv2.connectedComponents default 8-connectivity)."""
    try:
        import cv2
        n, labels = cv2.connectedComponents((mask > 0).astype(np.uint8))
    except ImportError:
        from scipy import ndimage
        labels, n = ndimage.label(mask > 0,
                                  structure=np.ones((3, 3), np.int32))
        n += 1
    if n <= 2:
        return mask
    areas = [(labels == i).sum() for i in range(1, n)]
    keep = np.argsort(areas)[::-1][:keep_top] + 1
    out = np.where(np.isin(labels, keep), mask, 0)
    return out.astype(mask.dtype)

"""Sliding-window inference parity vs the reference per-patch loop (oracle)."""
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segtran_tpu.infer.sliding import (sliding_window_2d, sliding_window_3d,
                                       window_grid)  # noqa: E402
from segtran_tpu.data.labelmaps import harden_segmap  # noqa: E402


class TorchToy(torch.nn.Module):
    """1x1 conv 'model' so both frameworks share exact weights."""
    def __init__(self, cin, cout, w, b):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 1)
        with torch.no_grad():
            self.conv.weight.copy_(torch.tensor(w).view(cout, cin, 1, 1))
            self.conv.bias.copy_(torch.tensor(b))

    def forward(self, x):
        return self.conv(x)


def test_window_grid_matches_reference_arithmetic():
    import math
    H2, dx, st = 130, 64, 32
    sx = math.ceil((H2 - dx) / st) + 1
    starts = [min(st * x, H2 - dx) for x in range(sx)]
    grid = window_grid((H2,), (64,), (32,))
    np.testing.assert_array_equal(grid[:, 0], starts)


def _ref_sliding_loop(net, image_batch, orig, patch, stride, num_classes):
    """Line-by-line transcription of reference test_util2d.py:153-223 (used as
    the oracle; the original hardcodes device='cuda' and imports imgaug, so it
    cannot be imported on this CPU test host)."""
    import math
    import torch.nn.functional as F
    B, C, H, W = image_batch.shape
    dx, dy = orig
    h_pad = max(dx - H, 0)
    w_pad = max(dy - W, 0)
    hl, wl = h_pad // 2, w_pad // 2
    if h_pad or w_pad:
        image_batch = F.pad(image_batch,
                            (wl, w_pad - wl, hl, h_pad - hl))
    H2, W2 = image_batch.shape[2:]
    sx = math.ceil((H2 - dx) / stride[0]) + 1
    sy = math.ceil((W2 - dy) / stride[1]) + 1
    preds_soft = torch.zeros(B, num_classes, H2, W2)
    cnt = torch.zeros(B, H2, W2)
    for x in range(sx):
        xs = min(stride[0] * x, H2 - dx)
        for y in range(sy):
            ys = min(stride[1] * y, W2 - dy)
            tp = image_batch[:, :, xs:xs + dx, ys:ys + dy]
            tp = F.interpolate(tp, size=patch, mode="bilinear",
                               align_corners=False)
            with torch.no_grad():
                scores = net(tp)
            scores = F.interpolate(scores, size=orig, mode="bilinear",
                                   align_corners=False)
            preds_soft[:, :, xs:xs + dx, ys:ys + dy] += torch.sigmoid(scores)
            cnt[:, xs:xs + dx, ys:ys + dy] += 1
    preds_soft = preds_soft / cnt.unsqueeze(1)
    return preds_soft[:, :, hl:hl + H, wl:wl + W]


@pytest.mark.parametrize("img_hw,orig,patch", [
    ((100, 120), (64, 64), (32, 32)),   # padding + multi window + downscale
    ((64, 64), (64, 64), (32, 32)),     # single window (the fundus case)
    ((160, 96), (64, 64), (64, 64)),    # no rescale, stride overlap
    ((60, 50), (64, 64), (32, 32)),     # image smaller than window both dims
])
def test_sliding2d_matches_reference(img_hw, orig, patch):
    rng = np.random.RandomState(0)
    cin, cout = 3, 3
    w = rng.randn(cout, cin).astype(np.float32) * 0.5
    b = rng.randn(cout).astype(np.float32) * 0.1
    img = rng.rand(2, cin, *img_hw).astype(np.float32)

    net = TorchToy(cin, cout, w, b).eval()
    preds_soft_ref = _ref_sliding_loop(
        net, torch.tensor(img), orig, patch,
        (orig[0] // 2, orig[1] // 2), cout).numpy()

    w_j = jnp.asarray(w)
    b_j = jnp.asarray(b)

    def model_fn(x):  # [N, h, w, cin] -> [N, h, w, cout]
        return jnp.einsum("nhwc,oc->nhwo", x, w_j) + b_j

    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    preds = sliding_window_2d(jax.jit(model_fn), img_j, orig, patch,
                              num_classes=cout)
    preds = np.asarray(preds).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(preds, preds_soft_ref, rtol=1e-4, atol=1e-5)

    # harden_segmap semantics: thresholded classes + consistent background
    hard = np.asarray(harden_segmap(jnp.asarray(preds.transpose(0, 2, 3, 1))))
    hard_ref = (preds_soft_ref >= 0.5).astype(int)
    hard_ref[:, 0] = (hard_ref[:, 1:].sum(axis=1) == 0)
    np.testing.assert_array_equal(hard.transpose(0, 3, 1, 2), hard_ref)


def test_sliding3d_shapes_and_blending():
    """3D path: coverage counts blend to exact probabilities for a constant
    model; window chunking must not change results."""
    def model_fn(x):  # [N, h, w, d, c] -> constant logits
        return jnp.zeros(x.shape[:-1] + (4,)) + 2.0

    vol = jnp.ones((1, 70, 70, 50, 4))
    out = sliding_window_3d(model_fn, vol, (32, 32, 24), (16, 16, 12),
                            num_classes=4, window_batch=None)
    expect = 1.0 / (1.0 + np.exp(-2.0))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    out_chunked = sliding_window_3d(model_fn, vol, (32, 32, 24), (16, 16, 12),
                                    num_classes=4, window_batch=4)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out),
                               rtol=1e-6)

"""Batched sliding-window inference with overlap blending.

Replaces the reference's per-patch Python loops:
  * 2D: test_single_batch (reference test_util2d.py:153-223)
  * 3D: test_single_case (reference test_util3d.py:93-184)

TPU-first design: the window grid is static for a given image size, so ALL
windows (across the grid and the batch) are gathered into one big patch batch,
resized once, pushed through ONE jitted model call (large batch -> full MXU
utilization), resized back, sigmoided, and scatter-added into the canvas with
a per-pixel coverage count. The whole pipeline is one XLA graph per
(image-size, grid) bucket -- no host round-trips per window. `window_batch`
caps the model batch to bound memory; chunks are processed with lax.map over
stacked window groups, still inside jit.

Semantics replicated exactly: center zero-pad up to window size
(test_util2d.py:159-176), start offsets xs = min(stride*i, S-win)
(clamped last window, :186-189), bilinear resize window->model-input and
logits->window (align_corners=False), sigmoid before accumulation, divide by
coverage count.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_linear


def window_grid(padded: Sequence[int], window: Sequence[int],
                stride: Sequence[int]) -> np.ndarray:
    """Static window start offsets, one row per window: [n_windows, d].
    Mirrors reference grid arithmetic (ceil((S-win)/stride)+1 windows per dim,
    last start clamped to S-win)."""
    axes = []
    for s, w, st in zip(padded, window, stride):
        n = int(math.ceil((s - w) / st)) + 1 if s > w else 1
        axes.append([min(st * i, s - w) for i in range(n)])
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1)


def _pad_centered(x: jnp.ndarray, window: Sequence[int]):
    """Zero-pad spatial dims up to at least `window`, centered (reference
    test_util2d.py:159-176). Returns (padded, lo_pads, orig_spatial)."""
    spatial = x.shape[1:-1]
    lo = []
    pads = [(0, 0)]
    for s, w in zip(spatial, window):
        pad = max(w - s, 0)
        pads.append((pad // 2, pad - pad // 2))
        lo.append(pad // 2)
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x, lo, spatial


def _run_windows(model_fn: Callable, x: jnp.ndarray, offsets: np.ndarray,
                 window: Sequence[int], model_input_size: Sequence[int],
                 num_classes: int, window_batch: Optional[int]) -> Tuple[
                     jnp.ndarray, jnp.ndarray]:
    """Gather windows -> model -> scatter-add. x: [B, *S, C] padded."""
    b = x.shape[0]
    d = len(window)
    n_win = offsets.shape[0]
    # Gather all windows: [n_win, B, *window, C]
    patches = jnp.stack([
        jax.lax.slice(x,
                      (0,) + tuple(int(o) for o in off) + (0,),
                      (b,) + tuple(int(o) + w for o, w in zip(off, window))
                      + (x.shape[-1],))
        for off in offsets], axis=0)
    patches = patches.reshape((n_win * b,) + tuple(window) + (x.shape[-1],))
    if tuple(model_input_size) != tuple(window):
        patches = resize_linear(patches, model_input_size)

    if window_batch is None or n_win * b <= window_batch:
        logits = model_fn(patches)
    else:
        # chunked model calls inside one jit (static chunk count)
        chunk = window_batch
        n_total = n_win * b
        n_chunks = math.ceil(n_total / chunk)
        pad_to = n_chunks * chunk
        if pad_to != n_total:
            patches = jnp.concatenate(
                [patches, jnp.zeros((pad_to - n_total,) + patches.shape[1:],
                                    patches.dtype)], axis=0)
        stacked = patches.reshape((n_chunks, chunk) + patches.shape[1:])
        logits = jax.lax.map(model_fn, stacked)
        logits = logits.reshape((pad_to,) + logits.shape[2:])[:n_total]

    if logits.shape[1:-1] != tuple(window):
        logits = resize_linear(logits, window)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    probs = probs.reshape((n_win, b) + tuple(window) + (num_classes,))

    canvas = jnp.zeros((b,) + x.shape[1:-1] + (num_classes,), jnp.float32)
    count = jnp.zeros((1,) + x.shape[1:-1] + (1,), jnp.float32)
    one = jnp.ones((1,) + tuple(window) + (1,), jnp.float32)
    for i, off in enumerate(offsets):
        idx = (slice(None),) + tuple(
            slice(int(o), int(o) + w) for o, w in zip(off, window)) + (
                slice(None),)
        canvas = canvas.at[idx].add(probs[i])
        count = count.at[idx].add(one)
    return canvas / count, count


def sliding_window_2d(model_fn: Callable, image: jnp.ndarray,
                      orig_input_size: Tuple[int, int],
                      patch_size: Tuple[int, int],
                      stride: Optional[Tuple[int, int]] = None,
                      num_classes: int = 2,
                      window_batch: Optional[int] = None) -> jnp.ndarray:
    """image: [B, H, W, C]; returns blended probs [B, H, W, num_classes].
    model_fn: jittable [N, *patch_size, C] -> [N, *, *, num_classes] logits."""
    stride = stride or (orig_input_size[0] // 2, orig_input_size[1] // 2)
    x, lo, orig_spatial = _pad_centered(image, orig_input_size)
    offsets = window_grid(x.shape[1:-1], orig_input_size, stride)
    preds, _ = _run_windows(model_fn, x, offsets, orig_input_size, patch_size,
                            num_classes, window_batch)
    sl = (slice(None),) + tuple(slice(l, l + s) for l, s in
                                zip(lo, orig_spatial)) + (slice(None),)
    return preds[sl]


def sliding_window_3d(model_fn: Callable, volume: jnp.ndarray,
                      orig_patch_size: Tuple[int, int, int],
                      input_patch_size: Tuple[int, int, int],
                      stride: Optional[Tuple[int, int, int]] = None,
                      num_classes: int = 4,
                      window_batch: Optional[int] = 8) -> jnp.ndarray:
    """volume: [B, H, W, D, C]; returns blended probs
    [B, H, W, D, num_classes]. Replaces the reference's triple loop
    (test_util3d.py:133-167) with one batched graph."""
    stride = stride or tuple(s // 2 for s in orig_patch_size)
    x, lo, orig_spatial = _pad_centered(volume, orig_patch_size)
    offsets = window_grid(x.shape[1:-1], orig_patch_size, stride)
    preds, _ = _run_windows(model_fn, x, offsets, orig_patch_size,
                            input_patch_size, num_classes, window_batch)
    sl = (slice(None),) + tuple(slice(l, l + s) for l, s in
                                zip(lo, orig_spatial)) + (slice(None),)
    return preds[sl]

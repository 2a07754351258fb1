"""Feature-robustness evaluation.

Parity target: reference eval_robustness (internal_util.py:197-343): run the
model on original and perturbed inputs (brightness / contrast / saturation
jitter, down/up resize, random noise), then report per-layer Pearson
correlations between original and perturbed feature maps, left/right-half
Pearson self-consistency, per-layer stds, and Dice deltas.

Feature maps come from flax 'intermediates' (the models sow in_fpn_feat and,
with keep_layer_outputs, per-translayer features), replacing the reference's
net.feature_maps side-channel.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _pearson(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    a = a - a.mean()
    b = b - b.mean()
    denom = jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b)) + 1e-8
    return jnp.sum(a * b) / denom


def lr_half_pearson(feat: jnp.ndarray) -> jnp.ndarray:
    """Pearson between left and right halves of a [B, H, W, C] map."""
    w = feat.shape[2]
    return _pearson(feat[:, :, : w // 2], feat[:, :, w - w // 2:])


_GRAY_W = jnp.asarray([0.299, 0.587, 0.114])


def _resize_roundtrip(x, scale):
    """Down(or up)-resize then restore: the reference's Resize((192,192)) /
    Resize((432,432)) perturbations relative to 288^2 inputs
    (internal_util.py:210-212), generalized to the input's own size."""
    h, w = x.shape[1:3]
    mid = (max(int(h * scale), 1), max(int(w * scale), 1))
    y = jax.image.resize(x, (x.shape[0],) + mid + (x.shape[-1],), "linear")
    return jax.image.resize(y, x.shape, "linear")


# reference aug roster (internal_util.py:206-213): ColorJitter
# brightness/contrast/saturation, Resize down/up, random noise
PERTURBATIONS: Dict[str, Callable] = {
    "brightness": lambda key, x, lo=0.7, hi=1.3: jnp.clip(
        x * jax.random.uniform(key, (), minval=lo, maxval=hi), 0, 1),
    "contrast": lambda key, x, lo=0.7, hi=1.3: jnp.clip(
        x.mean() + (x - x.mean())
        * jax.random.uniform(key, (), minval=lo, maxval=hi), 0, 1),
    "saturation": lambda key, x, lo=0.7, hi=1.3: jnp.clip(
        jnp.tensordot(x, _GRAY_W, axes=[[-1], [0]])[..., None]
        + (x - jnp.tensordot(x, _GRAY_W, axes=[[-1], [0]])[..., None])
        * jax.random.uniform(key, (), minval=lo, maxval=hi), 0, 1),
    "resize_down": lambda key, x, lo=0.0, hi=0.0: _resize_roundtrip(x, 2 / 3),
    "resize_up": lambda key, x, lo=0.0, hi=0.0: _resize_roundtrip(x, 1.5),
    "noise": lambda key, x, lo=0.0, hi=0.0: x + 0.1 * jax.random.normal(
        key, x.shape),
}


def eval_robustness(model, variables, images: jnp.ndarray,
                    perturbations: Sequence[str] = ("brightness", "contrast",
                                                    "saturation",
                                                    "resize_down",
                                                    "resize_up", "noise"),
                    seed: int = 0, degrees=(0.7, 1.3),
                    ref_variables=None) -> Dict[str, Dict[str, float]]:
    """Returns {pert: {layer_name: pearson, ..., 'lr_pearson/...': ...}}.

    ref_variables: optional second checkpoint's variables used to produce
    the CLEAN reference features (the reference's --robustcp refnet,
    test2d.py:634-638) — measures cross-checkpoint feature stability
    instead of same-net perturbation stability."""
    def run(x, variables=variables):
        out, inter = model.apply(variables, x, train=False,
                                 mutable=["intermediates"])
        feats = {}

        def walk(tree, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, f"{prefix}{k}/")
                else:
                    feats[f"{prefix}{k}"] = v[0] if isinstance(v, tuple) else v
        walk(inter.get("intermediates", {}))
        return out, feats

    base_out, base_feats = run(
        images, variables=(ref_variables if ref_variables is not None
                           else variables))
    results = {}
    key = jax.random.PRNGKey(seed)
    for i, pert in enumerate(perturbations):
        pkey = jax.random.fold_in(key, i)
        x2 = PERTURBATIONS[pert](pkey, images, degrees[0], degrees[1])
        out2, feats2 = run(x2)
        r = {}
        for name, f in base_feats.items():
            if name in feats2 and f.ndim >= 3:
                r[name] = float(_pearson(f, feats2[name]))
                r[f"lr_pearson/{name}"] = float(lr_half_pearson(feats2[name]))
                r[f"std/{name}"] = float(jnp.std(feats2[name]))
        r["output_pearson"] = float(_pearson(base_out, out2))
        results[pert] = r
    return results

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


PERTURBATIONS: Dict[str, Callable] = {
    "brightness": lambda key, x: jnp.clip(
        x * jax.random.uniform(key, (), minval=0.7, maxval=1.3), 0, 1),
    "contrast": lambda key, x: jnp.clip(
        x.mean() + (x - x.mean())
        * jax.random.uniform(key, (), minval=0.7, maxval=1.3), 0, 1),
    "noise": lambda key, x: x + 0.1 * jax.random.normal(key, x.shape),
}


def eval_robustness(model, variables, images: jnp.ndarray,
                    perturbations: Sequence[str] = ("brightness", "contrast",
                                                    "noise"),
                    seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Returns {pert: {layer_name: pearson, ..., 'lr_pearson/...': ...}}."""
    def run(x):
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

    base_out, base_feats = run(images)
    results = {}
    key = jax.random.PRNGKey(seed)
    for i, pert in enumerate(perturbations):
        pkey = jax.random.fold_in(key, i)
        x2 = PERTURBATIONS[pert](pkey, images)
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

"""Reference-faithful weight initialization transforms.

The reference applies three post-init passes over the module tree
(segtran2d.py:210-213):
  1. init_weights: normal(0, 0.02) on Linear weights, zero biases
     (segtran_shared.py:1246-1256) -- done here at param creation via
     kernel_init=normal(0.02) on every Dense.
  2. tie_qk: 'shared' makes K's weight *be* Q's (we share the Dense module
     instead); 'loose' copies Q's values into a separate K
     (segtran_shared.py:522-536).
  3. add_identity_bias: biases K's (and V's) first-mode weights toward the
     identity map (segtran_shared.py:538-546, 392-402).

Steps 2 (loose) and 3 are cross-parameter transforms, so they run after
model.init(). To locate the sites without hardcoding module paths, attention /
expansion modules sow their (num_modes, dims, scales) into a 'site_meta'
variable collection during init; this walker aligns that metadata tree with the
params tree.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _idbias_qk(kernel: jnp.ndarray, amd: int, scale: float,
               base_range: float) -> jnp.ndarray:
    """K-weight identity bias (reference segtran_shared.py:538-546).

    torch: W[out=:amd, in=:] = W*0.5 + (base*scale) * I_amd tiled along in.
    flax kernel layout is [in, out]: columns :amd get 0.5x + tiled identity.
    """
    in_dim = kernel.shape[0]
    rows = np.arange(in_dim) % amd
    eye_tiled = (rows[:, None] == np.arange(amd)[None, :]).astype(kernel.dtype)
    delta = jnp.asarray(eye_tiled) * (base_range * scale)
    return kernel.at[:, :amd].multiply(0.5).at[:, :amd].add(delta)


def _idbias_v(kernel: jnp.ndarray, feat_dim: int, scale: float,
              base_range: float) -> jnp.ndarray:
    """V (first_linear) identity bias (reference segtran_shared.py:392-402).

    torch: W[:F, :F] = W*0.5 + (base*scale) * I_F (first mode only).
    flax kernel [in, out]: block [:F, :F]."""
    eye = jnp.eye(feat_dim, dtype=kernel.dtype) * (base_range * scale)
    return kernel.at[:feat_dim, :feat_dim].multiply(0.5) \
                 .at[:feat_dim, :feat_dim].add(eye)


def apply_reference_init_schemes(params: Dict[str, Any],
                                 site_meta: Dict[str, Any]) -> Dict[str, Any]:
    """Apply loose-QK copies and identity biases in place of the reference's
    tie_qk / add_identity_bias module passes. Returns a new params pytree."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def walk(meta_node, params_node):
        if not isinstance(meta_node, dict):
            return
        if "attention" in meta_node and not isinstance(meta_node["attention"], dict):
            # flax sow wraps values in a tuple
            vals = np.asarray(meta_node["attention"][0])
            num_modes, in_dim, tie_code, qscale, base = (
                int(vals[0]), int(vals[1]), int(vals[2]), float(vals[3]),
                float(vals[4]))
            amd = in_dim // num_modes
            if "key" in params_node:  # untied Q/K
                if tie_code == 1:  # loose: K initialized from Q
                    params_node["key"]["kernel"] = params_node["query"]["kernel"]
                    if "bias" in params_node["key"] and "bias" in params_node["query"]:
                        params_node["key"]["bias"] = params_node["query"]["bias"]
                if qscale > 0:
                    params_node["key"]["kernel"] = _idbias_qk(
                        params_node["key"]["kernel"], amd, qscale, base)
            else:  # shared: bias the single shared kernel (torch aliases K to Q,
                   # then biases K == Q; segtran_shared.py:529,545)
                if qscale > 0 and "query" in params_node:
                    params_node["query"]["kernel"] = _idbias_qk(
                        params_node["query"]["kernel"], amd, qscale, base)
        if "expansion" in meta_node and not isinstance(meta_node["expansion"], dict):
            vals = np.asarray(meta_node["expansion"][0])
            feat_dim, vscale, base = int(vals[2]), float(vals[3]), float(vals[4])
            if vscale > 0 and "first_linear" in params_node:
                params_node["first_linear"]["kernel"] = _idbias_v(
                    params_node["first_linear"]["kernel"], feat_dim, vscale, base)
        for k, v in meta_node.items():
            if isinstance(v, dict) and k in params_node:
                walk(v, params_node[k])

    # flax stores sown vars under the same module-path tree as params; the
    # metadata leaves live one level below the attention module's path.
    def to_mutable(tree):
        if isinstance(tree, dict):
            return {k: to_mutable(v) for k, v in tree.items()}
        return tree

    params = to_mutable(params)
    walk(site_meta, params)
    return params


def init_with_reference_schemes(model, rngs, *args, jit_init=True, **kwargs):
    """model.init + the reference's post-init passes. Returns (params, rest)
    where rest holds non-param collections (e.g. batch_stats).

    jit_init compiles initialization into one XLA program -- essential on a
    remote TPU where eager per-op dispatch is round-trip bound."""
    from functools import partial
    init_fn = partial(model.init, **kwargs)
    if jit_init:
        init_fn = jax.jit(init_fn)
    variables = init_fn(rngs, *args)
    params = variables.get("params", {})
    site_meta = variables.get("site_meta", {})
    params = apply_reference_init_schemes(params, site_meta)
    rest = {k: v for k, v in variables.items()
            if k not in ("params", "site_meta")}
    return params, rest


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv default init (kaiming_uniform a=sqrt(5)) for flax HWIO
    kernels, so from-scratch training matches the reference's conv inits."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init

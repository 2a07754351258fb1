"""Polyformer: squeezed-attention adapter for few-shot domain adaptation
(MICCAI'21). Parity target: reference code/networks/polyformer.py.

PolyformerLayer (:8-55): 2x avg-pool the host CNN's features, run the
attractor squeeze (in_ator_trans: attractors <- tokens; ator_out_trans:
tokens <- attractors; both CrossAttFeatTrans with has_FFN=False), bilinear
upsample back, residual add. tie_qk 'shared' for source training, 'loose' for
target adaptation (K decoupled from Q so K-only finetuning works --
reference train2d.py:753-761).

Param-subset optimization (--sourceopt/--targetopt allpoly|inator|k|q|v|h)
is expressed as optax.multi_transform labels via
``polyformer_param_labels``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import flax.traverse_util
import jax.numpy as jnp

from ..nn.attention import CrossAttFeatTrans, TransLayerSpec
from ..ops.resize import avg_pool_nhwc, resize_linear


class PolyformerLayer(nn.Module):
    """One squeezed-attention adapter layer (reference polyformer.py:8-55).
    Input/output: channels-last feature map [B, H, W, F]."""
    feat_dim: int
    num_attractors: int = 256
    num_modes: int = 4
    tie_qk_scheme: str = "loose"
    qk_have_bias: bool = True
    has_FFN: bool = False
    poly_do_layernorm: bool = False
    attn_clip: float = 500.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feat: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        spec = TransLayerSpec(
            in_feat_dim=self.feat_dim, feat_dim=self.feat_dim,
            num_modes=self.num_modes, qk_have_bias=self.qk_have_bias,
            v_has_bias=False, tie_qk_scheme=self.tie_qk_scheme,
            attn_clip=self.attn_clip, has_FFN=self.has_FFN,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            dtype=self.dtype)
        b = in_feat.shape[0]
        # 2x downsample: full-res attention is needlessly slow
        # (polyformer.py:36-38)
        half = avg_pool_nhwc(in_feat, (2, 2))
        vfeat = half
        if self.poly_do_layernorm:
            vfeat = nn.LayerNorm(epsilon=1e-12, use_bias=False,
                                 use_scale=False, dtype=self.dtype,
                                 name="infeat_norm_layer")(vfeat)
        h2, w2 = half.shape[1:3]
        vfeat = vfeat.reshape(b, h2 * w2, self.feat_dim)

        attractors = self.param("attractors", nn.initializers.normal(1.0),
                                (1, self.num_attractors, self.feat_dim))
        batch_attractors = jnp.broadcast_to(
            attractors.astype(self.dtype),
            (b, self.num_attractors, self.feat_dim))
        new_attractors = CrossAttFeatTrans(spec, name="in_ator_trans")(
            batch_attractors, vfeat, deterministic=deterministic)
        vfeat_out = CrossAttFeatTrans(spec, name="ator_out_trans")(
            vfeat, new_attractors, deterministic=deterministic)
        out_half = vfeat_out.reshape(b, h2, w2, self.feat_dim)
        out = resize_linear(out_half, in_feat.shape[1:3])
        return in_feat + out  # residual (polyformer.py:51-53)


class Polyformer(nn.Module):
    """Stack of PolyformerLayers (reference polyformer.py:57-103; num_layers
    defaults to 1)."""
    feat_dim: int
    num_layers: int = 1
    num_attractors: int = 256
    num_modes: int = 4
    tie_qk_scheme: str = "loose"
    qk_have_bias: bool = True
    has_FFN: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feat: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = in_feat
        for i in range(self.num_layers):
            x = PolyformerLayer(
                feat_dim=self.feat_dim, num_attractors=self.num_attractors,
                num_modes=self.num_modes, tie_qk_scheme=self.tie_qk_scheme,
                qk_have_bias=self.qk_have_bias, has_FFN=self.has_FFN,
                dtype=self.dtype,
                name=f"polyformer_layers_{i}")(x, deterministic=deterministic)
        return x


def polyformer_param_labels(params, opt_mode: str,
                            frozen_label: str = "frozen",
                            train_label: str = "normal",
                            batch_stats=None,
                            bn_opt_scheme: str = None):
    """Label params for subset optimization, mirroring reference
    train2d.py:469-503: opt_mode in {allpoly, inator, k, q, v, h, allnet}
    (comma-separated combinations allowed). bn_opt_scheme='affine' also
    trains BatchNorm scale/bias (identified via the batch_stats tree --
    reference train2d.py:505-510)."""
    modes = opt_mode.split(",")
    flat = flax.traverse_util.flatten_dict(params)
    bn_paths = set()
    if bn_opt_scheme == "affine" and batch_stats is not None:
        for path in flax.traverse_util.flatten_dict(batch_stats):
            bn_paths.add(path[:-1])  # module path owning running stats
    labels = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        trained = path[:-1] in bn_paths
        if "allnet" in modes:
            trained = True
        if "allpoly" in modes and (
                "polyformer_layers" in name or "translayers" in name):
            trained = True
        if "inator" in modes and "in_ator_trans" in name:
            trained = True
        if "k" in modes and "in_ator_trans/key" in name:
            trained = True
        if "q" in modes and "in_ator_trans/query" in name:
            trained = True
        if "v" in modes and "in_ator_trans/out_trans/first_linear" in name:
            trained = True
        if "h" in modes and name.startswith("outc"):
            trained = True
        labels[path] = train_label if trained else frozen_label
    return flax.traverse_util.unflatten_dict(labels)

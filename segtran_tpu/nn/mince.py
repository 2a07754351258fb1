"""Mince transformer: channel-partitioned multi-scale attention (RAM saver).

Parity target: reference CrossMinceAttFeatTrans (segtran_shared.py:612-785)
plus ExpandedFeatTrans's mince fusion path (:421-443) and helpers
resize_flat_features (:47-66) / fracs_to_indices (:68-87):
  * Q/K projected once; each mode's channels split EQUALLY across scales
    (:633-634), per-scale Q/K spatially downsampled by 1/scale,
  * per-scale attention (scaled by sqrt(full attention_mode_dim), :736),
    clamp, optional per-scale positional bias, softmax, dropout,
  * V channels split by mince_channel_props; per-scale V downsampled, fused
    with the per-scale probs, upsampled back, channel-concatenated,
  * then the usual no-FFN aggregate or FFN path.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_linear
from .attention import (ExpandedFeatTrans, TransLayerSpec, _clamp_if_exceeds,
                        _normal)


def fracs_to_indices(feat_dim: int, props: Sequence[float]):
    """reference segtran_shared.py:68-87."""
    fr = np.asarray(props, dtype=float)
    fr = fr / fr.sum()
    n = len(fr)
    idx = [0] * (n + 1)
    for i in range(n - 1):
        idx[i + 1] = idx[i] + int(fr[i] * feat_dim)
    idx[-1] = feat_dim
    return idx


def scaled_shape(geoshape: Sequence[int], scale: float) -> Tuple[int, ...]:
    """reference multi_resize_shape (:38-43): int(s / scale)."""
    return tuple(int(s / scale) for s in geoshape)


def resize_flat_features(x: jnp.ndarray, geoshape: Sequence[int],
                         new_geoshape: Sequence[int]) -> jnp.ndarray:
    """x: [B, M, N, C] flat tokens over `geoshape` -> resized flat tokens over
    new_geoshape (reference :47-66; bilinear/trilinear align_corners=False)."""
    b, m, n, c = x.shape
    sp = tuple(geoshape)
    assert int(np.prod(sp)) == n, (sp, n)
    # merge (M, C) into channels so one spatial resize covers all modes
    vol = x.transpose(0, 2, 1, 3).reshape((b,) + sp + (m * c,))
    vol = resize_linear(vol, new_geoshape)
    n2 = int(np.prod(new_geoshape))
    out = vol.reshape(b, n2, m, c).transpose(0, 2, 1, 3)
    return out


class CrossMinceAttFeatTrans(nn.Module):
    """Multi-scale attention layer (reference segtran_shared.py:612-785)."""
    spec: TransLayerSpec
    mince_scales: Tuple[int, ...] = (2, 1)
    mince_channel_props: Tuple[float, ...] = (1.0, 1.0)
    keep_attn_scores: bool = False

    @nn.compact
    def __call__(self, in_query: jnp.ndarray,
                 query_geoshape: Sequence[int],
                 in_key: Optional[jnp.ndarray] = None,
                 key_geoshape: Optional[Sequence[int]] = None,
                 pos_biases: Optional[List[Optional[jnp.ndarray]]] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        s = self.spec
        if self.is_initializing():
            tie_code = {"shared": 0, "loose": 1, "none": 2}[s.tie_qk_scheme]
            self.sow("site_meta", "attention", jnp.array(
                [s.num_modes, s.in_feat_dim, tie_code,
                 s.query_idbias_scale, s.base_initializer_range],
                dtype=jnp.float32))
        if in_key is None:
            in_key = in_query
            key_geoshape = query_geoshape
        b, u1, _ = in_query.shape
        u2 = in_key.shape[1]
        m, amd = s.num_modes, s.attention_mode_dim
        n_scales = len(self.mince_scales)
        qk_idx = fracs_to_indices(amd, [1.0] * n_scales)

        query = nn.Dense(s.att_size_allmode, use_bias=s.qk_have_bias,
                         kernel_init=_normal(s.base_initializer_range),
                         bias_init=nn.initializers.zeros, dtype=s.dtype,
                         name="query")
        if s.tie_qk_scheme == "shared":
            q, k = query(in_query), query(in_key)
        else:
            key = nn.Dense(s.att_size_allmode, use_bias=s.qk_have_bias,
                           kernel_init=_normal(s.base_initializer_range),
                           bias_init=nn.initializers.zeros, dtype=s.dtype,
                           name="key")
            q, k = query(in_query), key(in_key)
        q = q.reshape(b, u1, m, amd).transpose(0, 2, 1, 3)
        k = k.reshape(b, u2, m, amd).transpose(0, 2, 1, 3)

        scales_probs = []
        for si, scale in enumerate(self.mince_scales):
            lo, hi = qk_idx[si], qk_idx[si + 1]
            q_s = q[..., lo:hi]
            k_s = k[..., lo:hi]
            q_shape = scaled_shape(query_geoshape, scale)
            k_shape = scaled_shape(key_geoshape, scale)
            if scale != 1:
                q_s = resize_flat_features(q_s, query_geoshape, q_shape)
                k_s = resize_flat_features(k_s, key_geoshape, k_shape)
            scores = jnp.einsum("bmqd,bmkd->bmqk", q_s, k_s,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(amd)
            scores = _clamp_if_exceeds(scores, s.attn_clip)
            if pos_biases is not None and pos_biases[si] is not None:
                scores = scores + s.pos_code_weight * pos_biases[si]
            if self.keep_attn_scores:
                self.sow("intermediates", f"attention_scores_{si}", scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(s.dtype)
            probs = nn.Dropout(s.attention_probs_dropout_prob)(
                probs, deterministic=deterministic)
            scales_probs.append(probs)

        out_trans = ExpandedFeatTrans(s, name="out_trans")
        v = out_trans.compute_v(in_key)          # [B, M, U2, F]
        v_idx = fracs_to_indices(s.feat_dim, self.mince_channel_props)
        fused_scales = []
        for si, scale in enumerate(self.mince_scales):
            lo, hi = v_idx[si], v_idx[si + 1]
            v_s = v[..., lo:hi]
            k_shape = scaled_shape(key_geoshape, scale)
            if scale != 1:
                v_s = resize_flat_features(v_s, key_geoshape, k_shape)
            fused = jnp.einsum("bmqk,bmkf->bmqf", scales_probs[si], v_s,
                               preferred_element_type=s.dtype)
            if scale != 1:
                q_shape = scaled_shape(query_geoshape, scale)
                fused = resize_flat_features(fused, q_shape, query_geoshape)
            fused_scales.append(fused)
        fused_all = jnp.concatenate(fused_scales, axis=-1)
        return out_trans(in_key, fused=fused_all,
                         deterministic=deterministic)

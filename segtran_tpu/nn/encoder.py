"""SegtranFusionEncoder: the multi-layer fusion transformer.

Parity target: reference segtran_shared.py:819-975. Per layer i:
  vfeat -> affine LayerNorm -> (+ pos_code_weight * poscode[..., :dim_i])
        -> non-affine LayerNorm -> dropout (layer 0 only) -> * mask
        -> Squeezed/Mince/CrossAtt translayer.
The positional code is computed at full trans_in_dim and sliced per layer
(segtran_shared.py:929-932); 'bias' codes are instead passed into the layer and
added to attention scores.

Returns the final features plus (optionally, via flax 'intermediates')
per-layer features for visualization / the attention-consistency loss.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs.base import TransformerConfig
from ..ops.norm import layer_norm
from .attention import (CrossAttFeatTrans, SqueezedAttFeatTrans, TransLayerSpec)
from .poscode import SegtranPosEncoder


def layer_spec_from_config(cfg: TransformerConfig, layer_i: int) -> TransLayerSpec:
    """Build the per-layer spec from the model config (reference
    segtran_shared.py:880-884: in=dims[i], out=dims[i+1])."""
    return TransLayerSpec(
        in_feat_dim=cfg.translayer_dims[layer_i],
        feat_dim=cfg.translayer_dims[layer_i + 1],
        num_modes=cfg.num_modes,
        qk_have_bias=cfg.qk_have_bias,
        v_has_bias=cfg.v_has_bias,
        tie_qk_scheme=cfg.tie_qk_scheme,
        attn_clip=cfg.attn_clip,
        has_FFN=cfg.has_FFN,
        mid_type=cfg.mid_type,
        trans_output_type=cfg.trans_output_type,
        pool_modes_feat=cfg.pool_modes_feat,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        base_initializer_range=cfg.base_initializer_range,
        query_idbias_scale=cfg.query_idbias_scale,
        feattrans_lin1_idbias_scale=cfg.feattrans_lin1_idbias_scale,
        pos_code_weight=cfg.pos_code_weight if cfg.pos_code_type == "bias" else 1.0,
        keep_attn_diag=cfg.attn_diag,
        ablate_multihead=cfg.ablate_multihead,
        fix_private_output_residual=cfg.fix_private_output_residual,
        use_fused_attention=cfg.use_fused_attention,
        use_fused_epilogue=getattr(cfg, "use_fused_epilogue", False),
        reassociate=getattr(cfg, "reassociate", True),
        ln_eps=cfg.ln_eps,
        dtype=cfg.dtype,
    )


class SegtranFusionEncoder(nn.Module):
    """Stack of num_translayers squeezed/cross attention layers
    (reference segtran_shared.py:819-975)."""
    cfg: TransformerConfig
    keep_layer_outputs: bool = False

    @nn.compact
    def __call__(self, vfeat: jnp.ndarray, voxels_pos: jnp.ndarray,
                 vmask: jnp.ndarray, spatial_shape: Sequence[int],
                 deterministic: bool = True) -> jnp.ndarray:
        """vfeat: [B, N, C]; voxels_pos: [B, N, pos_dim]; vmask: [B, N, 1].
        spatial_shape: static (H2, W2[, D2]) of the token grid."""
        cfg = self.cfg
        if cfg.use_squeezed_transformer and cfg.pos_code_type == "bias":
            raise ValueError(
                "Squeezed transformer cannot use positional biases; pass "
                "--nosqueeze to disable the squeezed transformer "
                "(reference segtran_shared.py:841-844)")
        pos_is_bias = cfg.pos_code_type == "bias"
        # Reference adds poscode at every layer; weight 0 when 'bias'
        # (segtran_shared.py:846-850).
        pos_code_weight = cfg.pos_code_weight if not pos_is_bias else 0.0

        pos_encoder = SegtranPosEncoder(
            pos_code_type=cfg.pos_code_type, pos_dim=cfg.pos_dim,
            pos_embed_dim=cfg.trans_in_dim,
            pos_bias_radius=cfg.pos_bias_radius,
            ln_eps=cfg.ln_eps, dtype=cfg.dtype, name="pos_code_layer")
        # mince + 'bias': one pos encoder per scale, shared by all translayers
        # (reference segtran_shared.py:856-861 builds them once in __init__)
        mince_pos_encoders = []
        if cfg.use_mince_transformer and pos_is_bias:
            mince_pos_encoders = [
                SegtranPosEncoder(
                    pos_code_type="bias", pos_dim=cfg.pos_dim,
                    pos_embed_dim=cfg.trans_in_dim,
                    pos_bias_radius=cfg.pos_bias_radius,
                    ln_eps=cfg.ln_eps, dtype=cfg.dtype,
                    name=f"pos_code_layers_{si}")
                for si in range(len(cfg.mince_scales))]

        for i in range(cfg.num_translayers):
            dim_i = cfg.translayer_dims[i]
            spec = layer_spec_from_config(cfg, i)
            vfeat_normed = layer_norm(
                cfg.dtype, epsilon=cfg.ln_eps,
                name=f"vfeat_norm_layers_{i}")(vfeat)
            # The positional code is regenerated per layer in the reference;
            # under jit XLA CSEs the identical subgraphs, so this costs one
            # evaluation.
            pos_code = pos_encoder(spatial_shape, voxels_pos)
            pos_biases = None
            if pos_is_bias:
                pos_biases = pos_code
                feat_normed = vfeat_normed
            elif cfg.pos_code_type == "none":
                feat_normed = vfeat_normed
            else:
                feat_comb = vfeat_normed + pos_code_weight * pos_code[:, :, :dim_i]
                feat_normed = layer_norm(
                    cfg.dtype, epsilon=cfg.ln_eps, use_bias=False,
                    use_scale=False, name=f"comb_norm_layers_{i}")(feat_comb)
            if i == 0:
                feat_normed = nn.Dropout(cfg.hidden_dropout_prob)(
                    feat_normed, deterministic=deterministic)
            feat_masked = feat_normed * vmask

            if cfg.use_squeezed_transformer:
                layer = SqueezedAttFeatTrans(
                    spec, num_attractors=cfg.num_attractors,
                    has_FFN_in_squeeze=cfg.has_FFN_in_squeeze,
                    keep_attn_scores=cfg.use_attn_consist_loss,
                    name=f"translayers_{i}")
                vfeat = layer(feat_masked, pos_biases=pos_biases,
                              deterministic=deterministic)
            elif cfg.use_mince_transformer:
                from .mince import CrossMinceAttFeatTrans, scaled_shape
                mince_pos = None
                if pos_is_bias:
                    # per-scale biases from the shared per-scale encoders
                    # (reference segtran_shared.py:917-923)
                    mince_pos = [
                        enc(scaled_shape(spatial_shape, sc), voxels_pos)
                        for enc, sc in zip(mince_pos_encoders,
                                           cfg.mince_scales)]
                layer = CrossMinceAttFeatTrans(
                    spec, mince_scales=cfg.mince_scales,
                    mince_channel_props=cfg.mince_channel_props,
                    keep_attn_scores=cfg.use_attn_consist_loss,
                    name=f"translayers_{i}")
                vfeat = layer(feat_masked, spatial_shape,
                              pos_biases=mince_pos,
                              deterministic=deterministic)
            else:
                layer = CrossAttFeatTrans(
                    spec, keep_attn_scores=cfg.use_attn_consist_loss,
                    name=f"translayers_{i}")
                vfeat = layer(feat_masked, pos_biases=pos_biases,
                              deterministic=deterministic)
            if self.keep_layer_outputs:
                self.sow("intermediates", f"layer_{i}_vfeat", vfeat)
        return vfeat

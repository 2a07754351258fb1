"""Segtran25d: depth folded into batch, per-slice 2D EfficientNet pyramids,
re-assembled into volumes and fused by the 3D-pos-encoded transformer.

Parity target: reference code/networks/segtran25d.py (forward :380-477,
in_fpn_forward :264-316, out_fpn_forward :318-377). Differences from
Segtran3d faithfully kept:
  * coordinates ordered (H, W, D) -- not (D, H, W) (segtran25d.py:399-436),
  * depth-last volume layout in the out-FPN,
  * 'conv' depth unpooling INTERLEAVES depth (d*K+k; segtran25d.py:362-366),
    unlike segtran3d's block ordering,
  * 'stemconv' input scheme: the EfficientNet stem takes the 4-channel input
    directly (reference patches the stem conv; our flax Conv infers input
    channels, and the converter maps the 4-channel kernel as-is).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs.base import Segtran25dConfig
from ..nn.backbones.efficientnet import EfficientNetFeatures
from ..nn.backbones.resnet import ResNetFeatures
from ..nn.encoder import SegtranFusionEncoder
from ..nn.poscode import gen_all_indices
from ..ops.resize import resize_linear, avg_pool_nhwc


def _gn(g, dtype, name):
    return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=dtype, name=name)


class Segtran25d(nn.Module):
    cfg: Segtran25dConfig
    bn_axis_name: Optional[str] = None
    input_scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """batch: [B, H, W, D, C] -> logits [B, H, W, D, num_classes]."""
        cfg = self.cfg
        dt = cfg.dtype
        conv3d1 = lambda f, name: nn.Conv(f, (1, 1, 1), dtype=dt, name=name)
        conv2d1 = lambda f, name: nn.Conv(f, (1, 1), dtype=dt, name=name)
        b, h, w, d, c = batch.shape
        assert c == cfg.orig_in_channels
        d_orig = d

        # depth grouping: G consecutive slices merge into channels BEFORE the
        # bridge/backbone, channel index = c*G + g (segtran25d.py:385-396;
        # eff_in_channels = orig_in_channels * D_groupsize)
        G = cfg.D_groupsize
        if G > 1:
            assert d % G == 0, (d, G)
            batch = batch.reshape(b, h, w, d // G, G, c)
            batch = batch.transpose(0, 1, 2, 3, 5, 4).reshape(
                b, h, w, d // G, c * G)
            d = d // G
            c = c * G

        # channel bridge on the (grouped) channels (segtran25d.py:121-147)
        if c != 3 and cfg.inchan_to3_scheme != "stemconv":
            if cfg.inchan_to3_scheme == "bridgeconv":
                batch = conv3d1(3, "in_bridge_to3")(batch)
            elif cfg.inchan_to3_scheme == "dup3" and c == 1:
                batch = jnp.repeat(batch, 3, axis=-1)
            else:
                raise ValueError(cfg.inchan_to3_scheme)
        # fold depth into batch: [B*D, H, W, c] (segtran25d.py:398-407)
        fake2d = batch.transpose(0, 3, 1, 2, 4).reshape(b * d, h, w, -1)

        pool_stride = 2 ** min(cfg.in_fpn_layers)
        if not cfg.bb_feat_upsize:
            pool_stride *= 2
        pooled = avg_pool_nhwc(jnp.abs(fake2d), (pool_stride, pool_stride))
        nonzero_mask = (jnp.sum(pooled, axis=-1) > 0).astype(jnp.float32)

        if cfg.remat:
            wrap = lambda cls: nn.remat(cls, static_argnums=(2,))
        else:
            wrap = lambda cls: cls
        if cfg.backbone_type.startswith("eff"):
            feats = wrap(EfficientNetFeatures)(
                variant=cfg.backbone_type,
                stem_stride=1 if cfg.bb_feat_upsize else 2,
                remat_blocks=cfg.remat_blocks,
                dw_stencil=cfg.dw_stencil,
                bn_axis_name=self.bn_axis_name, dtype=dt,
                name="backbone")(fake2d, train)
        else:
            feats = wrap(ResNetFeatures)(
                variant=cfg.backbone_type, do_pool1=not cfg.bb_feat_upsize,
                bn_axis_name=self.bn_axis_name, dtype=dt,
                name="backbone")(fake2d, train)

        # ---- 2D input FPN on folded batch (segtran25d.py:264-289) ----
        curr = feats[cfg.in_fpn_layers[0]]
        for layer in cfg.in_fpn_layers[:-1]:
            upconv = conv2d1(cfg.bb_feat_dims[layer + 1],
                             f"in_fpn{layer}{layer+1}_conv")(curr)
            higher = resize_linear(feats[layer + 1], upconv.shape[1:-1])
            norm = _gn(cfg.G, dt, f"in_gn{layer+1}b")
            if cfg.in_fpn_scheme == "AN":
                curr = norm(upconv + higher)
            else:
                curr = norm(upconv) + higher
        if cfg.bb_feat_dims[cfg.in_fpn_layers[-1]] != cfg.trans_in_dim:
            curr = conv2d1(cfg.trans_in_dim, "in_fpn_bridgeconv")(curr)

        # unfold depth: [B, H2, W2, D, C], then depth-pool to D3
        # (segtran25d.py:291-316)
        h2, w2 = curr.shape[1:3]
        vol = curr.reshape(b, d, h2, w2, -1).transpose(0, 2, 3, 1, 4)
        d3 = d // cfg.D_pool_K
        vol = resize_linear(vol, (h2, w2, d3))
        maskv = nonzero_mask.reshape(b, d, h2, w2).transpose(0, 2, 3, 1)
        maskv = resize_linear(maskv[..., None], (h2, w2, d3))[..., 0]
        vmask = (maskv >= 0.5).astype(dt)

        vfeat_fpn = vol.reshape(b, h2 * w2 * d3, cfg.trans_in_dim)
        vmask = vmask.reshape(b, h2 * w2 * d3)
        self.sow("intermediates", "in_fpn_feat", vol)   # [B, h2, w2, d3, C]

        # coordinates ordered (H, W, D) (segtran25d.py:413-436). The depth
        # scale uses the PRE-grouping depth: reference model_scale_D = D // D3
        # with the original D (segtran25d.py:436), i.e. G * D_pool_K when
        # D_groupsize G > 1 — voxel depth pos codes span the raw slice index.
        scale_h, scale_w, scale_d = h // h2, w // w2, d_orig // d3
        assert scale_h * h2 == h and scale_w * w2 == w and scale_d * d3 == d_orig
        total_scale = jnp.asarray([[scale_h / self.input_scale[0],
                                    scale_w / self.input_scale[1],
                                    scale_d / self.input_scale[2]]],
                                  jnp.float32)
        xyz = gen_all_indices((h2, w2, d3)).reshape(-1, 3).astype(jnp.float32)
        voxels_pos = jnp.broadcast_to((xyz * total_scale)[None],
                                      (b, h2 * w2 * d3, 3))

        enc_cls = (nn.remat(SegtranFusionEncoder, static_argnums=(4, 5))
                   if cfg.remat else SegtranFusionEncoder)
        vfeat_fused = enc_cls(cfg, name="voxel_fusion")(
            vfeat_fpn, voxels_pos, vmask[..., None], (h2, w2, d3),
            not train)
        vfeat_fused = vfeat_fused.reshape(b, h2, w2, d3, cfg.trans_out_dim)

        # ---- 3D output FPN on depth-last volumes (segtran25d.py:318-377) ----
        do_out_fpn = cfg.out_fpn_layers != cfg.in_fpn_layers
        if do_out_fpn:
            def to_vol(f2d):
                hh, ww = f2d.shape[1:3]
                return f2d.reshape(b, d, hh, ww, -1).transpose(0, 2, 3, 1, 4)

            curr = to_vol(feats[cfg.out_fpn_layers[0]])
            extra_layers = cfg.out_fpn_layers[:-len(cfg.in_fpn_layers)]
            for layer in extra_layers:
                upconv = conv3d1(cfg.bb_feat_dims[layer + 1],
                                 f"out_fpn{layer}{layer+1}_conv3d")(curr)
                higher = resize_linear(to_vol(feats[layer + 1]),
                                       upconv.shape[1:-1])
                norm = _gn(cfg.G, dt, f"out_gn{layer+1}b")
                if cfg.out_fpn_scheme == "AN":
                    curr = norm(upconv + higher)
                else:
                    curr = norm(upconv) + higher
            # Linear tail reassociated exactly as in segtran2d/3d (see
            # nn/heads.py): full-resolution ops at num_classes channels.
            dropout_active = (cfg.out_fpn_do_dropout and train
                              and cfg.hidden_dropout_prob > 0)
            if not dropout_active:
                from ..nn.heads import (Conv1x1Params, apply_pointwise,
                                        compose_1x1, compose_fold_head)
                K = cfg.D_pool_K
                fold = K > 1 and cfg.out_fpn_upsampleD_scheme == "conv"
                wb, bb_ = Conv1x1Params(cfg.trans_out_dim, 3,
                                        name="out_fpn_bridgeconv3d")(
                    curr.shape[-1])
                if fold:
                    fdim = cfg.trans_out_dim // K
                    wu, bu = Conv1x1Params(fdim * K, 3,
                                           name="out_fpn_upsampleD")(
                        cfg.trans_out_dim)
                    wo, bo = Conv1x1Params(cfg.num_classes, 3,
                                           name="out_conv3d")(fdim)
                    wo, bo = compose_fold_head(wu, bu, wo, bo, K)
                else:
                    wo, bo = Conv1x1Params(cfg.num_classes, 3,
                                           name="out_conv3d")(
                        cfg.trans_out_dim)
                w_comp, b_comp = compose_1x1(wb, bb_, wo, bo)
                scores = apply_pointwise(curr, w_comp, b_comp)
                fused_cls = apply_pointwise(vfeat_fused, wo)
                scores = scores + resize_linear(fused_cls, curr.shape[1:-1])
                if fold:
                    # channels (k, cls) -> depth d*K + k, the reference's
                    # INTERLEAVED fold order (segtran25d.py:362-366): plain
                    # reshape, (d, k) is already lexicographic
                    b2, hh, ww, dd, _ = scores.shape
                    scores = scores.reshape(b2, hh, ww, dd * K,
                                            cfg.num_classes)
                elif K > 1 and cfg.out_fpn_upsampleD_scheme in (
                        "interp", "interpolate"):
                    dd = scores.shape[3] * K
                    scores = resize_linear(scores, scores.shape[1:3] + (dd,))
            else:
                up_fused = resize_linear(vfeat_fused, curr.shape[1:-1])
                out_feat = conv3d1(cfg.trans_out_dim,
                                   "out_fpn_bridgeconv3d")(curr) + up_fused
                out_feat_dim = cfg.trans_out_dim
                if cfg.D_pool_K > 1:
                    if cfg.out_fpn_upsampleD_scheme == "conv":
                        out_feat_dim = cfg.trans_out_dim // cfg.D_pool_K
                        ups = conv3d1(out_feat_dim * cfg.D_pool_K,
                                      "out_fpn_upsampleD")(out_feat)
                        bb, hh, ww, dd, _ = ups.shape
                        # channel o = f*K + k -> (f, k); depth INTERLEAVES
                        # as (d, k) -> d*K + k (segtran25d.py:362-366)
                        ups = ups.reshape(bb, hh, ww, dd, out_feat_dim,
                                          cfg.D_pool_K)
                        ups = ups.transpose(0, 1, 2, 3, 5, 4)
                        out_feat = ups.reshape(bb, hh, ww,
                                               dd * cfg.D_pool_K,
                                               out_feat_dim)
                    elif cfg.out_fpn_upsampleD_scheme in ("interp",
                                                          "interpolate"):
                        dd = out_feat.shape[3] * cfg.D_pool_K
                        out_feat = resize_linear(
                            out_feat, out_feat.shape[1:3] + (dd,))
                out_feat = nn.Dropout(cfg.hidden_dropout_prob)(
                    out_feat, deterministic=not train)
                scores = conv3d1(cfg.num_classes, "out_conv3d")(out_feat)
        else:
            scores = conv3d1(cfg.num_classes, "out_conv3d")(vfeat_fused)

        return resize_linear(scores.astype(jnp.float32), (h, w, d_orig))

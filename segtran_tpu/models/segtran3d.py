"""Segtran3d: I3D backbone -> 3D FPN with depth pooling -> 3D-pos-encoded
fusion transformer -> 3D output FPN with depth unpooling -> head.

Parity target: reference code/networks/segtran3d.py (forward :398-498,
in_fpn_forward :285-334, out_fpn_forward :336-396, get_mask :266-270,
channel->3 bridge :117-139). Layout: volumes are [B, H, W, D, C]
channels-last; internally depth moves to the I3D frame dim ([B, D, H, W, C],
reference :422-423).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.base import Segtran3dConfig
from ..nn.backbones.i3d import I3DFeatures
from ..nn.encoder import SegtranFusionEncoder
from ..nn.poscode import gen_all_indices
from ..ops.resize import resize_linear, avg_pool_nhwc


def _gn(g, dtype, name):
    return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=dtype, name=name)


class Segtran3d(nn.Module):
    cfg: Segtran3dConfig
    bn_axis_name: Optional[str] = None
    input_scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)  # (H, W, D)

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """batch: [B, H, W, D, C] -> logits [B, H, W, D, num_classes]."""
        cfg = self.cfg
        dt = cfg.dtype
        conv1x1 = lambda feats, name: nn.Conv(feats, (1, 1, 1), dtype=dt,
                                              name=name)
        b, h, w, d, c = batch.shape
        assert c == cfg.orig_in_channels

        # channel -> 3 "RGB" bridge for I3D (segtran3d.py:117-139)
        if c != 3:
            if cfg.inchan_to3_scheme == "bridgeconv":
                fake_rgb = conv1x1(3, "in_bridge_to3")(batch)
            elif cfg.inchan_to3_scheme == "avgto3":
                if c == 4:
                    wmat = jnp.asarray([[1, 0, 0], [0, 0.5, 0],
                                        [0, 0.5, 0], [0, 0, 1]], dt)
                elif c == 2:
                    wmat = jnp.asarray([[1, 0.5, 0], [0, 0.5, 1]], dt).T
                else:
                    raise ValueError("avgto3 needs 2 or 4 channels")
                fake_rgb = batch @ wmat
            elif cfg.inchan_to3_scheme == "dup3" and c == 1:
                fake_rgb = jnp.repeat(batch, 3, axis=-1)
            else:
                raise ValueError(
                    f"unsupported inchan_to3_scheme {cfg.inchan_to3_scheme}")
        else:
            fake_rgb = batch

        # depth -> frame dim: [B, D, H, W, 3] (segtran3d.py:422-423)
        vol = fake_rgb.transpose(0, 3, 1, 2, 4)

        # nonzero mask (segtran3d.py:147-161, 266-270); pool kernel (D, H, W)
        if cfg.bb_feat_upsize:
            pool = {2: (2, 4, 4), 3: (4, 8, 8)}.get(
                min(cfg.in_fpn_layers), (8, 16, 16))
        else:
            pool = {2: (2, 8, 8), 3: (4, 16, 16)}.get(
                min(cfg.in_fpn_layers), (8, 32, 32))
        pooled = avg_pool_nhwc(jnp.abs(vol), pool)
        nonzero_mask = (jnp.sum(pooled, axis=-1) > 0).astype(jnp.float32)

        i3d_cls = (nn.remat(I3DFeatures, static_argnums=(2,))
                   if cfg.remat else I3DFeatures)
        feats = i3d_cls(do_pool1=not cfg.bb_feat_upsize,
                        bn_axis_name=self.bn_axis_name, dtype=dt,
                        name="backbone")(vol, train)

        # ---- input FPN (segtran3d.py:285-334) ----
        curr = feats[cfg.in_fpn_layers[0]]
        for layer in cfg.in_fpn_layers[:-1]:
            upconv = conv1x1(cfg.bb_feat_dims[layer + 1],
                             f"in_fpn{layer}{layer+1}_conv")(curr)
            higher = resize_linear(feats[layer + 1], upconv.shape[1:-1])
            norm = _gn(cfg.G, dt, f"in_gn{layer+1}b")
            if cfg.in_fpn_scheme == "AN":
                curr = norm(upconv + higher)
            else:
                curr = norm(upconv) + higher
        if cfg.bb_feat_dims[cfg.in_fpn_layers[-1]] != cfg.trans_in_dim:
            curr = conv1x1(cfg.trans_in_dim, "in_fpn_bridgeconv")(curr)

        # depth pooling by D_pool_K via trilinear interp (segtran3d.py:315-323)
        d1, h2, w2 = curr.shape[1:4]
        d2 = d1 // cfg.D_pool_K
        curr = resize_linear(curr, (d2, h2, w2))
        mask_p = resize_linear(nonzero_mask[..., None], (d2, h2, w2))
        vmask = (mask_p[..., 0] >= 0.5).astype(dt)

        vfeat_fpn = curr.reshape(b, d2 * h2 * w2, cfg.trans_in_dim)
        vmask = vmask.reshape(b, d2 * h2 * w2)
        self.sow("intermediates", "in_fpn_feat", curr)   # [B, d2, h2, w2, C]

        # ---- positional coordinates (segtran3d.py:442-470); order (D, H, W)
        scale_d, scale_h, scale_w = d // d2, h // h2, w // w2
        assert scale_d * d2 == d and scale_h * h2 == h and scale_w * w2 == w
        total_scale = jnp.asarray([[scale_d / self.input_scale[2],
                                    scale_h / self.input_scale[0],
                                    scale_w / self.input_scale[1]]],
                                  jnp.float32)
        zyx = gen_all_indices((d2, h2, w2)).reshape(-1, 3).astype(jnp.float32)
        zyx = zyx * total_scale
        voxels_pos = jnp.broadcast_to(zyx[None], (b, d2 * h2 * w2, 3))

        enc_cls = (nn.remat(SegtranFusionEncoder, static_argnums=(4, 5))
                   if cfg.remat else SegtranFusionEncoder)
        vfeat_fused = enc_cls(cfg, name="voxel_fusion")(
            vfeat_fpn, voxels_pos, vmask[..., None], (d2, h2, w2),
            not train)
        vfeat_fused = vfeat_fused.reshape(b, d2, h2, w2, cfg.trans_out_dim)

        # ---- output FPN (segtran3d.py:336-396) ----
        do_out_fpn = cfg.out_fpn_layers != cfg.in_fpn_layers
        if do_out_fpn:
            curr = feats[cfg.out_fpn_layers[0]]
            extra_layers = cfg.out_fpn_layers[:-len(cfg.in_fpn_layers)]
            for layer in extra_layers:
                upconv = conv1x1(cfg.bb_feat_dims[layer + 1],
                                 f"out_fpn{layer}{layer+1}_conv3d")(curr)
                higher = resize_linear(feats[layer + 1], upconv.shape[1:-1])
                norm = _gn(cfg.G, dt, f"out_gn{layer+1}b")
                if cfg.out_fpn_scheme == "AN":
                    curr = norm(upconv + higher)
                else:
                    curr = norm(upconv) + higher
            last_out_layer = cfg.out_fpn_layers[-len(cfg.in_fpn_layers)]
            # The whole tail below (bridge 1x1, add, 'interp' depth unpool,
            # transpose, out_conv 1x1) is linear when out-FPN dropout is
            # inactive, so it can be reassociated to run every
            # curr-resolution op at num_classes channels instead of
            # trans_out_dim — see nn/heads.py. ~256x less HBM traffic on the
            # tail; identical math (reference order: segtran3d.py:336-396).
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
                    # compose fold ('conv' depth-unpool) with the head too
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
                fused_cls = apply_pointwise(vfeat_fused, wo)  # bias in b_comp
                scores = scores + resize_linear(fused_cls, curr.shape[1:-1])
                if fold:
                    # channels (k, cls) -> depth k*D + d, the reference's
                    # block fold order (segtran3d.py:376-379)
                    b2, dd, hh, ww, _ = scores.shape
                    scores = scores.reshape(b2, dd, hh, ww, K,
                                            cfg.num_classes)
                    scores = scores.transpose(0, 4, 1, 2, 3, 5).reshape(
                        b2, K * dd, hh, ww, cfg.num_classes)
                elif K > 1 and cfg.out_fpn_upsampleD_scheme == "interp":
                    dd = scores.shape[1] * K
                    scores = resize_linear(scores, (dd,) + scores.shape[2:4])
                # frame dim -> depth-last (segtran3d.py:488)
                scores = scores.transpose(0, 2, 3, 1, 4)
            else:
                up_fused = resize_linear(vfeat_fused, curr.shape[1:-1])
                out_feat = conv1x1(cfg.trans_out_dim,
                                   "out_fpn_bridgeconv3d")(curr) + up_fused
                out_feat_dim = cfg.trans_out_dim

                # depth unpooling (segtran3d.py:369-388)
                if cfg.D_pool_K > 1:
                    if cfg.out_fpn_upsampleD_scheme == "conv":
                        out_feat_dim = cfg.trans_out_dim // cfg.D_pool_K
                        ups = conv1x1(out_feat_dim * cfg.D_pool_K,
                                      "out_fpn_upsampleD")(out_feat)
                        bb, dd, hh, ww, _ = ups.shape
                        # channel-fold: output channel o = f*K + k splits
                        # into (f, k); depth flattens as (k, d) -> k*D + d,
                        # exactly the reference's view() ordering
                        # (segtran3d.py:376-379).
                        ups = ups.reshape(bb, dd, hh, ww, out_feat_dim,
                                          cfg.D_pool_K)
                        ups = ups.transpose(0, 5, 1, 2, 3, 4)
                        out_feat = ups.reshape(bb, cfg.D_pool_K * dd, hh, ww,
                                               out_feat_dim)
                    elif cfg.out_fpn_upsampleD_scheme == "interp":
                        dd = out_feat.shape[1] * cfg.D_pool_K
                        out_feat = resize_linear(
                            out_feat, (dd,) + out_feat.shape[2:4])
                    # 'none': keep pooled depth
                if cfg.out_fpn_do_dropout:
                    out_feat = nn.Dropout(cfg.hidden_dropout_prob)(
                        out_feat, deterministic=not train)
                # frame dim -> depth-last: [B, H, W, D', F]
                out_feat = out_feat.transpose(0, 2, 3, 1, 4)
                scores = conv1x1(cfg.num_classes, "out_conv3d")(out_feat)
        else:
            out_feat = vfeat_fused.transpose(0, 2, 3, 1, 4)
            scores = conv1x1(cfg.num_classes, "out_conv3d")(out_feat)

        return resize_linear(scores.astype(jnp.float32), (h, w, d))

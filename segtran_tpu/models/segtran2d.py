"""Segtran2d: CNN backbone -> input FPN -> squeeze-expansion fusion
transformer -> output FPN -> segmentation head.

Parity target: reference code/networks/segtran2d.py (Segtran2d.forward
:314-438, in_fpn_forward :235-271, out_fpn_forward :273-312, get_mask
:229-233). TPU-first: channels-last NHWC end to end, jit-compiled with static
shapes, bilinear resizes matching torch align_corners=False.

Param scope names mirror the reference attribute names (backbone,
in_fpn34_conv, in_gn4b, voxel_fusion, out_fpn_bridgeconv, out_conv, ...) so the
state_dict converter maps released checkpoints without special cases.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import Segtran2dConfig
from ..nn.backbones.efficientnet import EfficientNetFeatures
from ..nn.backbones.resnet import ResNetFeatures
from ..nn.encoder import SegtranFusionEncoder
from ..nn.poscode import gen_all_indices
from ..ops.resize import resize_linear, avg_pool_nhwc


def _gn(g, dtype, name):
    # torch GroupNorm eps default 1e-5 (segtran2d.py:148-150)
    return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=dtype, name=name)


def _bn(train, dtype, name, axis_name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, axis_name=axis_name,
                        name=name)


class Segtran2d(nn.Module):
    cfg: Segtran2dConfig
    bn_axis_name: Optional[str] = None

    def _backbone(self):
        cfg = self.cfg
        def wrap(cls):
            # remat over (self, x) with `train` static
            return nn.remat(cls, static_argnums=(2,)) if cfg.remat else cls
        if cfg.backbone_type.startswith("eff-"):
            return wrap(EfficientNetFeatures)(
                variant=cfg.backbone_type,
                stem_stride=1 if cfg.bb_feat_upsize else 2,
                scan_blocks=cfg.scan_blocks,
                remat_blocks=cfg.remat_blocks,
                dw_stencil=cfg.dw_stencil,
                bn_axis_name=self.bn_axis_name, dtype=cfg.dtype,
                name="backbone")
        if cfg.backbone_type.startswith("effv2"):
            from ..nn.backbones.efficientnetv2 import EfficientNetV2Features
            return wrap(EfficientNetV2Features)(
                variant=cfg.backbone_type,
                stem_stride=1 if cfg.bb_feat_upsize else 2,
                bn_axis_name=self.bn_axis_name, dtype=cfg.dtype,
                name="backbone")
        if cfg.backbone_type.startswith("resnet"):
            return wrap(ResNetFeatures)(
                variant=cfg.backbone_type, do_pool1=not cfg.bb_feat_upsize,
                bn_axis_name=self.bn_axis_name, dtype=cfg.dtype,
                name="backbone")
        raise ValueError(f"unknown backbone {cfg.backbone_type}")

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """batch: [B, H, W, C] (or [B, H, W, C, MOD] with num_modalities>0).
        Returns logits [B, H, W, num_classes]."""
        cfg = self.cfg
        dt = cfg.dtype
        conv1x1 = lambda feats, name: nn.Conv(feats, (1, 1), dtype=dt,
                                              name=name)

        if cfg.num_modalities > 0:
            b0, h, w, c, mod = batch.shape
            # modality folded into batch (segtran2d.py:321-328)
            batch = batch.transpose(0, 4, 1, 2, 3).reshape(b0 * mod, h, w, c)
        else:
            b0, mod = batch.shape[0], 0
        b, h, w, _ = batch.shape

        # nonzero mask: AvgPool(|x|) summed over channels > 0
        # (segtran2d.py:229-233); pool stride from the lowest in-FPN layer.
        pool_stride = 2 ** min(cfg.in_fpn_layers)
        if not cfg.bb_feat_upsize:
            pool_stride *= 2
        pooled = avg_pool_nhwc(jnp.abs(batch), (pool_stride, pool_stride))
        nonzero_mask = jnp.sum(pooled, axis=-1) > 0  # [B, H2, W2]

        # positional `train` so nn.remat's static_argnums applies
        feats = self._backbone()(batch, train)

        # ---- input FPN (segtran2d.py:235-271) ----
        curr = feats[cfg.in_fpn_layers[0]]
        for layer in cfg.in_fpn_layers[:-1]:
            upconv = conv1x1(cfg.bb_feat_dims[layer + 1],
                             f"in_fpn{layer}{layer+1}_conv")(curr)
            higher = resize_linear(feats[layer + 1], upconv.shape[1:-1])
            norm_name = f"in_gn{layer+1}b" if not cfg.in_fpn_use_bn \
                else f"in_bn{layer+1}b"
            norm = _gn(cfg.G, dt, norm_name) if not cfg.in_fpn_use_bn \
                else _bn(train, dt, norm_name, self.bn_axis_name)
            if cfg.in_fpn_scheme == "AN":
                curr = norm(upconv + higher)
            else:
                curr = norm(upconv) + higher
        if cfg.bb_feat_dims[cfg.in_fpn_layers[-1]] != cfg.trans_in_dim:
            curr = conv1x1(cfg.trans_in_dim, "in_fpn_bridgeconv")(curr)
        h2, w2 = curr.shape[1], curr.shape[2]
        vfeat_fpn = curr.reshape(b, h2 * w2, cfg.trans_in_dim)
        vmask = nonzero_mask.reshape(b, h2 * w2)
        self.sow("intermediates", "in_fpn_feat", curr)

        if cfg.num_modalities > 0:
            # max-fuse modalities after in-FPN (segtran2d.py:361-368)
            vfeat_fpn = vfeat_fpn.reshape(b0, mod, h2 * w2, cfg.trans_in_dim)
            vfeat_fpn = jnp.max(vfeat_fpn, axis=1)
            vmask = vmask.reshape(b0, mod, h2 * w2)[:, 0]

        # ---- positional coordinates (segtran2d.py:372-392) ----
        scale_h, scale_w = h // h2, w // w2
        assert scale_h * h2 == h and scale_w * w2 == w, \
            "input size must be divisible by the FPN grid"
        xy = gen_all_indices((h2, w2)).reshape(-1, 2).astype(jnp.float32)
        xy = xy * jnp.asarray([[scale_h, scale_w]], jnp.float32)
        voxels_pos = jnp.broadcast_to(xy[None], (b0, h2 * w2, 2))

        # ---- fusion transformer ----
        if not cfg.use_global_bias:
            enc_cls = (nn.remat(SegtranFusionEncoder,
                                static_argnums=(4, 5))
                       if cfg.remat else SegtranFusionEncoder)
            vfeat_fused = enc_cls(
                cfg, keep_layer_outputs=not cfg.remat, name="voxel_fusion")(
                vfeat_fpn, voxels_pos, vmask[..., None].astype(dt), (h2, w2),
                not train)
        else:
            # learned global bias ablation (segtran2d.py:79-85, 413-417)
            vfeat_bias = self.param("vfeat_bias",
                                    nn.initializers.normal(1.0),
                                    (1, 1, cfg.trans_out_dim))
            vfeat_bias = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                      name="vfeat_bias_norm_layer")(vfeat_bias)
            vfeat_fused = jnp.broadcast_to(
                vfeat_bias.astype(dt), (b0, h2 * w2, cfg.trans_out_dim))

        vfeat_fused = vfeat_fused.reshape(b0, h2, w2, cfg.trans_out_dim)

        # ---- output FPN (segtran2d.py:273-312) ----
        if cfg.num_modalities > 0:
            # max-fuse the pyramid over modalities so the out-FPN operates on
            # [B0, ...] like the fused transformer features (the reference's
            # 2D multi-modality hook never reconciles these shapes; fusing the
            # pyramid is the consistent extension of its in-FPN max fusion)
            feats = tuple(
                jnp.max(f.reshape((b0, mod) + f.shape[1:]), axis=1)
                for f in feats)
        do_out_fpn = cfg.out_fpn_layers != cfg.in_fpn_layers
        if do_out_fpn:
            curr = feats[cfg.out_fpn_layers[0]]
            extra_layers = cfg.out_fpn_layers[:-len(cfg.in_fpn_layers)]
            for layer in extra_layers:
                upconv = conv1x1(cfg.bb_feat_dims[layer + 1],
                                 f"out_fpn{layer}{layer+1}_conv")(curr)
                higher = resize_linear(feats[layer + 1], upconv.shape[1:-1])
                norm_name = f"out_gn{layer+1}b" if not cfg.out_fpn_use_bn \
                    else f"out_bn{layer+1}b"
                norm = _gn(cfg.G, dt, norm_name) if not cfg.out_fpn_use_bn \
                    else _bn(train, dt, norm_name, self.bn_axis_name)
                if cfg.out_fpn_scheme == "AN":
                    curr = norm(upconv + higher)
                else:
                    curr = norm(upconv) + higher
            last_out_layer = cfg.out_fpn_layers[-len(cfg.in_fpn_layers)]
            need_bridge = cfg.bb_feat_dims[last_out_layer] != cfg.trans_out_dim
            # Linear tail (1x1 bridge, add, upsample, 1x1 head) reassociated
            # to run the out-FPN-resolution ops at num_classes channels and
            # out_conv on the small fused grid — identical math when out-FPN
            # dropout is inactive (see nn/heads.py; reference order
            # segtran2d.py:273-312). Parity tests run this path.
            dropout_active = (cfg.out_fpn_do_dropout and train
                              and cfg.hidden_dropout_prob > 0)
            if not dropout_active:
                from ..nn.heads import (Conv1x1Params, apply_pointwise,
                                        compose_1x1)
                wo, bo = Conv1x1Params(cfg.num_classes, 2,
                                       name="out_conv")(cfg.trans_out_dim)
                if need_bridge:
                    wb, bb_ = Conv1x1Params(cfg.trans_out_dim, 2,
                                            name="out_fpn_bridgeconv")(
                        curr.shape[-1])
                    w1, b1 = compose_1x1(wb, bb_, wo, bo)
                else:
                    w1, b1 = wo, bo
                scores = apply_pointwise(curr, w1, b1)
                fused_cls = apply_pointwise(vfeat_fused, wo)  # bias in b1
                scores = scores + resize_linear(fused_cls, curr.shape[1:-1])
            else:
                if need_bridge:
                    curr = conv1x1(cfg.trans_out_dim,
                                   "out_fpn_bridgeconv")(curr)
                out_feat = curr + resize_linear(vfeat_fused,
                                                curr.shape[1:-1])
                out_feat = nn.Dropout(cfg.hidden_dropout_prob)(
                    out_feat, deterministic=not train)
                scores = conv1x1(cfg.num_classes, "out_conv")(out_feat)
        else:
            if 2 in cfg.in_fpn_layers:
                scores = conv1x1(cfg.num_classes, "out_conv")(vfeat_fused)
            else:
                # 1/8-res features: learn a 2x upsampling head
                # (segtran2d.py:205-208)
                scores = nn.ConvTranspose(cfg.num_classes, (2, 2),
                                          strides=(2, 2), dtype=dt,
                                          name="out_conv")(vfeat_fused)

        # final bilinear to input resolution (segtran2d.py:435-436)
        return resize_linear(scores.astype(jnp.float32), (h, w))

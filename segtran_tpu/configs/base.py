"""Typed configuration for the Segtran model family.

Capability-parity with the reference config system:
  * ``SegtranConfig`` hyperparameters   -> reference segtran_shared.py:90-156
  * FPN / layer-compression derivation  -> reference segtran_shared.py:158-196
  * 2D / 3D / 2.5D variants             -> reference segtran2d.py:16-63,
    segtran3d.py:19-77, segtran25d.py:15-74

Design differences (TPU-first): configs are immutable dataclasses (hashable, so
they can be fields of flax modules and static args of jit), there is no mutable
module-level CONFIG singleton, and dtype policy (params fp32 / compute bf16) is
part of the config.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Per-backbone channel dims of the 5-level feature pyramid.
# Mirrors reference segtran_shared.py:15-26.
BACKBONE_FEAT_DIMS = {
    "resnet34":  (64, 64, 128, 256, 512),
    "resnet50":  (64, 256, 512, 1024, 2048),
    "resnet101": (64, 256, 512, 1024, 2048),
    "eff-tiny":  (8, 8, 16, 40, 448),
    "eff-b0":    (16, 24, 40, 112, 1280),
    "eff-b1":    (16, 24, 40, 112, 1280),
    "eff-b2":    (16, 24, 48, 120, 1408),
    "eff-b3":    (24, 32, 48, 136, 1536),
    "eff-b4":    (24, 32, 56, 160, 1792),
    "eff-b5":    (24, 40, 64, 176, 2048),
    "effv2s":    (24, 48, 64, 160, 256),
    "effv2m":    (24, 48, 80, 176, 512),
    "effv2l":    (32, 64, 96, 224, 640),
    "i3d":       (64, 192, 480, 832, 1024),
}


def _derive_translayer_dims(orig_in_feat_dim: int,
                            compress_ratios: Tuple[float, ...]) -> Tuple[int, ...]:
    """Adjacent compression ratios -> per-layer dims via cumulative product.

    ``(1., 1., 2., 2.)`` means layer dims ``orig/(1, 1, 2, 4)``.
    Mirrors reference segtran_shared.py:177-183.
    """
    abs_ratios = np.cumprod(np.asarray(compress_ratios, dtype=np.float64))
    return tuple(int(orig_in_feat_dim / r) for r in abs_ratios)


@dataclass(frozen=True)
class TransformerConfig:
    """Application-independent transformer settings (reference segtran_shared.py:90-156)."""
    # dims of each translayer boundary; index i is the input dim of layer i.
    # Derived -- do not set directly; use Segtran*Config.derive().
    translayer_dims: Tuple[int, ...] = (1792, 1792)

    num_modes: int = 4
    use_squeezed_transformer: bool = True
    num_attractors: int = 256
    tie_qk_scheme: str = "shared"          # shared | loose | none
    mid_type: str = "shared"               # shared | private | none
    trans_output_type: str = "private"     # shared | private
    has_FFN: bool = True
    has_FFN_in_squeeze: bool = False

    pos_code_type: str = "lsinu"           # lsinu | rand | sinu | none | bias
    pos_code_weight: float = 1.0
    pos_bias_radius: int = 7
    pos_dim: int = 2

    qk_have_bias: bool = True
    v_has_bias: bool = False
    attn_clip: float = 500.0
    base_initializer_range: float = 0.02
    query_idbias_scale: float = 10.0
    feattrans_lin1_idbias_scale: float = 10.0

    pool_modes_feat: str = "softmax"       # softmax | max | mean | none

    # Mince (multi-scale, channel-partitioned) transformer settings.
    use_mince_transformer: bool = False
    mince_scales: Optional[Tuple[int, ...]] = None
    mince_channel_props: Optional[Tuple[float, ...]] = None

    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    out_fpn_do_dropout: bool = False
    ablate_multihead: bool = False
    use_attn_consist_loss: bool = False

    # Attention runtime diagnostics: sow per-layer (max, pos-avg, clamped)
    # attention stats; the trainers log a max-attn/avg-attn/clamp-count line
    # on the reference's every-N-calls cadence (segtran_shared.py:582-587).
    attn_diag: bool = False

    # Pallas flash-style fused attention for serving/training fast path.
    use_fused_attention: bool = False

    # Pallas fused private-output+LayerNorm+mode-pool epilogue over the
    # encoder's [B, M, N, F] mid tensors (kernels/expansion_epilogue.py);
    # inference-only fast path, exact XLA modules remain the training path.
    use_fused_epilogue: bool = False

    # Exact matmul reassociations exploiting A << N in the squeezed layers
    # (V/W1 push-through and QK folds, nn/attention.py). Same math, ~N/A
    # fewer projection FLOPs; off only for ablation/debugging.
    reassociate: bool = True

    # Rematerialize backbone + fusion encoder activations in the backward pass
    # (jax.checkpoint): trades ~30% step FLOPs for large HBM savings, enabling
    # bigger batches / whole-volume training on 16GB v5e chips.
    remat: bool = False

    # Per-MBConv-block rematerialization of the CNN backbone (independent of
    # the coarse `remat` above, composable with it): the backward recomputes
    # each block's BN/silu/SE internals from the block input instead of
    # streaming them from HBM. Motivation (round-4 profiling, _prof_bwd.py):
    # in the full train step the eff-b4 backward moves ~128 GB HBM for only
    # ~0.3 TFLOP because XLA cannot fuse the backbone's forward elementwise
    # chains into a backward separated from them by the whole encoder;
    # recomputing them costs ~5 ms of forward FLOPs and removes that traffic.
    remat_blocks: bool = False

    # Lower the EfficientNet depthwise convs as shifted-slice stencils
    # (ops/depthwise.py) instead of grouped-conv primitives: identical math
    # and param tree; XLA fuses the stencil (and its backward) into
    # single-pass elementwise loops instead of the materialization-heavy
    # grouped-conv gradient lowering found in round-4 profiling.
    dw_stencil: bool = False

    # lax.scan over each EfficientNet segment's identical MBConv repeats
    # (stacked params): identical eval numerics, much smaller HLO -> faster
    # first compile through the remote-compile tunnel. Changes the param
    # layout; checkpoints in either layout are adapted on load
    # (nn/backbones/efficientnet.py maybe_adapt_scan_layout).
    scan_blocks: bool = False

    # If True, apply the *corrected* residual in the private FFN output.
    # The reference's MMPrivateOutput computes a residual but then normalizes the
    # non-residual tensor (segtran_shared.py:266-275) -- released checkpoints were
    # trained with that behavior, so the default reproduces it exactly.
    fix_private_output_residual: bool = False

    # numerics
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32               # compute dtype (bf16 for speed)

    @property
    def num_translayers(self) -> int:
        return len(self.translayer_dims) - 1

    @property
    def trans_in_dim(self) -> int:
        return self.translayer_dims[0]

    @property
    def trans_out_dim(self) -> int:
        return self.translayer_dims[-1]

    @property
    def min_feat_dim(self) -> int:
        return min(self.translayer_dims)


@dataclass(frozen=True)
class Segtran2dConfig(TransformerConfig):
    """2D variant defaults (reference segtran2d.py:16-63)."""
    backbone_type: str = "eff-b4"
    use_pretrained: bool = True
    bb_feat_upsize: bool = True            # stem stride 1 -> 2x larger feature maps
    in_fpn_layers: Tuple[int, ...] = (3, 4)
    out_fpn_layers: Tuple[int, ...] = (1, 2, 3, 4)
    in_fpn_scheme: str = "AN"              # AN: add then norm; NA: norm then add
    out_fpn_scheme: str = "AN"
    in_fpn_use_bn: bool = False
    out_fpn_use_bn: bool = False
    G: int = 8                             # groups in GroupNorm
    pos_dim: int = 2
    max_pos_size: Tuple[int, ...] = (100, 100)
    num_classes: int = 2
    num_modalities: int = 0
    use_global_bias: bool = False
    # compression ratios; length must be num_translayers + 1
    translayer_compress_ratios: Tuple[float, ...] = (1.0, 1.0)

    @property
    def bb_feat_dims(self) -> Tuple[int, ...]:
        return BACKBONE_FEAT_DIMS[self.backbone_type]

    @property
    def orig_in_feat_dim(self) -> int:
        return self.bb_feat_dims[self.in_fpn_layers[-1]]

    def derive(self, **overrides) -> "Segtran2dConfig":
        """Return a config with translayer_dims derived from compression ratios.

        Mirrors reference set_fpn_layers (segtran_shared.py:158-196): validates
        FPN layer compatibility and computes per-layer dims.
        """
        cfg = dataclasses.replace(self, **overrides) if overrides else self
        if cfg.out_fpn_layers[-1] > cfg.in_fpn_layers[-1]:
            raise ValueError(
                f"in_fpn_layers={cfg.in_fpn_layers} is not compatible with "
                f"out_fpn_layers={cfg.out_fpn_layers}")
        dims = _derive_translayer_dims(cfg.orig_in_feat_dim,
                                       cfg.translayer_compress_ratios)
        return dataclasses.replace(cfg, translayer_dims=dims)


@dataclass(frozen=True)
class Segtran3dConfig(TransformerConfig):
    """3D variant defaults (reference segtran3d.py:19-77)."""
    backbone_type: str = "i3d"
    use_pretrained: bool = True
    bb_feat_upsize: bool = True
    in_fpn_layers: Tuple[int, ...] = (3, 4)
    out_fpn_layers: Tuple[int, ...] = (1, 2, 3, 4)
    in_fpn_scheme: str = "AN"
    out_fpn_scheme: str = "AN"
    in_fpn_use_bn: bool = False
    out_fpn_use_bn: bool = False
    G: int = 8
    pos_dim: int = 3
    num_attractors: int = 1024
    max_pos_size: Tuple[int, ...] = (20, 20, 20)
    num_classes: int = 4
    num_modalities: int = 0
    use_global_bias: bool = False
    translayer_compress_ratios: Tuple[float, ...] = (1.0, 1.0)
    # BraTS 4-modality -> 3-channel bridge for I3D (reference segtran3d.py:117-139)
    inchan_to3_scheme: str = "bridgeconv"  # avgto3 | only1 | dup3 | bridgeconv
    orig_in_channels: int = 4
    # depth pooling of in-FPN features before the transformer
    D_pool_K: int = 2
    # 2.5D slice grouping: G consecutive depth slices merge into channels
    # before the per-slice backbone (segtran25d.py:385-396; every reference
    # recipe uses 1). Consumed by Segtran25d only.
    D_groupsize: int = 1
    out_fpn_upsampleD_scheme: str = "interp"   # interp | conv | none

    @property
    def bb_feat_dims(self) -> Tuple[int, ...]:
        return BACKBONE_FEAT_DIMS[self.backbone_type]

    @property
    def orig_in_feat_dim(self) -> int:
        return self.bb_feat_dims[self.in_fpn_layers[-1]]

    def derive(self, **overrides) -> "Segtran3dConfig":
        cfg = dataclasses.replace(self, **overrides) if overrides else self
        if cfg.out_fpn_layers[-1] > cfg.in_fpn_layers[-1]:
            raise ValueError(
                f"in_fpn_layers={cfg.in_fpn_layers} is not compatible with "
                f"out_fpn_layers={cfg.out_fpn_layers}")
        dims = _derive_translayer_dims(cfg.orig_in_feat_dim,
                                       cfg.translayer_compress_ratios)
        return dataclasses.replace(cfg, translayer_dims=dims)


@dataclass(frozen=True)
class Segtran25dConfig(Segtran3dConfig):
    """2.5D variant defaults (reference segtran25d.py:15-74): depth folded into
    batch, per-slice 2D backbone, 3D-pos-encoded transformer fusion."""
    backbone_type: str = "eff-b3"
    inchan_to3_scheme: str = "stemconv"
    out_fpn_upsampleD_scheme: str = "conv"

    @property
    def bb_feat_dims(self) -> Tuple[int, ...]:
        return BACKBONE_FEAT_DIMS[self.backbone_type]

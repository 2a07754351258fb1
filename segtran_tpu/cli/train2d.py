"""2D training driver (the reference's code/train2d.py as one jitted graph).

Differences from the reference runtime, by design:
  * augmentation + label mapping + input downscale run ON DEVICE inside the
    jitted train step (the reference does them in DataLoader workers and with
    per-step F.interpolate, train2d.py:1147-1205),
  * DDP/SyncBN/DistributedSampler/reduce_tensor are replaced by one
    mesh-sharded jit (parallel/mesh.py),
  * checkpoints are orbax trees with config sidecars (train/checkpoint.py).

Usage (mirrors the reference recipe, README.md:19-21):
  python -m segtran_tpu.cli.train2d --task fundus --translayers 3 \
      --layercompress 1,1,2,2 --net segtran --bb eff-b4 --maxiter 10000 \
      --bs 6 --noqkbias --dataroot /path/to/data
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Segtran2dConfig
from ..configs.presets import NET_SETTINGS, TASK_SETTINGS
from ..data.augment import Aug2dConfig, augment_batch_2d
from ..data.datasets2d import SegCrop, SegWhole, ConcatDataset
from ..data.labelmaps import fundus_map_mask, polyp_map_mask, index_to_onehot
from ..data.pipeline import batch_iterator, prefetch_to_device
from ..models import Segtran2d
from ..models.unet2d import VanillaUNet
from ..nn.init import init_with_reference_schemes
from ..ops.resize import resize_linear
from ..parallel.mesh import (make_mesh, replicate_to_mesh,
                             shard_batch_to_mesh, shard_train_step)
from ..train.checkpoint import save_checkpoint, load_checkpoint, merge_params
from ..train.trainer import (build_optimizer, create_train_state,
                             make_loss_fn, make_train_step)
from ..utils import AverageMeters, setup_logging


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", dest="task_name", default="fundus",
                   choices=list(TASK_SETTINGS))
    p.add_argument("--ds", dest="ds_names", default=None,
                   help="comma-separated dataset names")
    p.add_argument("--split", default="train", choices=["train", "all"])
    p.add_argument("--dataroot", default="../data")
    p.add_argument("--net", default="segtran")
    p.add_argument("--bb", dest="backbone_type", default="eff-b4")
    p.add_argument("--translayers", dest="num_translayers", type=int,
                   default=3)
    p.add_argument("--layercompress", dest="translayer_compress_ratios",
                   default=None, help="e.g. 1,1,2,2")
    p.add_argument("--attractors", dest="num_attractors", type=int,
                   default=256)
    p.add_argument("--modes", dest="num_modes", type=int, default=-1)
    p.add_argument("--dropout", dest="dropout_prob", type=float, default=-1)
    p.add_argument("--noqkbias", dest="qk_have_bias", action="store_false")
    p.add_argument("--nosqueeze", dest="use_squeezed_transformer",
                   action="store_false")
    p.add_argument("--pos", dest="pos_code_type", default="lsinu",
                   choices=["lsinu", "rand", "sinu", "none", "bias"])
    p.add_argument("--multihead", dest="ablate_multihead",
                   action="store_true")
    p.add_argument("--mince", dest="use_mince_transformer",
                   action="store_true",
                   help="multi-scale (mince) attention (reference "
                        "train2d.py:210-214)")
    p.add_argument("--mincescales", dest="mince_scales", default=None,
                   help="e.g. 1,2,3,4")
    p.add_argument("--minceprops", dest="mince_channel_props", default=None,
                   help="e.g. 0.4,0.3,0.2,0.1")
    p.add_argument("--infpn", dest="in_fpn_layers", default="34")
    p.add_argument("--outfpn", dest="out_fpn_layers", default="1234")
    p.add_argument("--maxiter", type=int, default=10000)
    p.add_argument("--saveiter", type=int, default=500)
    p.add_argument("--logiter", type=lambda v: max(int(v), 1), default=50,
                   help="log running loss averages every N iters (min 1)")
    p.add_argument("--bs", dest="batch_size", type=int, default=6)
    p.add_argument("--lr", type=float, default=-1)
    p.add_argument("--decay", type=float, default=-1)
    p.add_argument("--gradclip", dest="grad_clip", type=float, default=-1)
    p.add_argument("--lrwarmup", dest="lr_warmup_steps", type=int,
                   default=500)
    p.add_argument("--diceweight", dest="max_dice_w", type=float, default=0.5)
    p.add_argument("--focus", dest="focus_class", type=int, default=-1)
    p.add_argument("--randscale", type=float, default=0.2)
    p.add_argument("--affine", dest="do_affine", action="store_true",
                   help="random affine aug: p=0.3 rotate(-45,45)+shear(-16,16)"
                        " (reference train2d.py:237, train_util.py:42-49)")
    p.add_argument("--gray", dest="gray_alpha", type=float, default=0.5)
    p.add_argument("--stats", dest="stats_json", default=None,
                   help="dataset mean/std JSON (reference format)")
    p.add_argument("--polyformer", dest="polyformer_mode", default=None,
                   choices=[None, "source", "target"])
    p.add_argument("--adv", dest="adversarial_mode", default=None,
                   choices=[None, "feat", "mask"],
                   help="adversarial DA on features or predicted masks")
    p.add_argument("--sourceds", dest="source_ds_name", default="train",
                   help="source-domain dataset for adversarial DA")
    p.add_argument("--domweight", dest="domain_loss_w", type=float,
                   default=0.002)
    p.add_argument("--adda", action="store_true",
                   help="ADDA two-step adversarial training instead of "
                        "RevGrad (reference train2d.py:1278-1283)")
    p.add_argument("--reconweight", dest="recon_w", type=float, default=0.0)
    p.add_argument("--attnclip", dest="attn_clip", type=float, default=500.0,
                   help="attention-score clamp (reference --attnclip, "
                        "train2d.py:136)")
    p.add_argument("--gbias", dest="use_global_bias", action="store_true",
                   help="replace the transformer output with a learned "
                        "global bias (ablation; reference --gbias)")
    p.add_argument("--inbn", dest="in_fpn_use_bn", action="store_true",
                   help="BatchNorm instead of GroupNorm in the input FPN "
                        "(reference --inbn)")
    p.add_argument("--outdrop", dest="out_fpn_do_dropout",
                   action="store_true",
                   help="dropout on the out-FPN features (reference "
                        "--outdrop)")
    p.add_argument("--nofeatup", dest="bb_feat_upsize", action="store_false",
                   help="keep the backbone stem stride 2 (no 2x feature "
                        "upsizing; reference --nofeatup)")
    p.add_argument("--posw", dest="pos_code_weight", type=float, default=1.0,
                   help="positional-code weight (reference --posw)")
    p.add_argument("--posr", dest="pos_bias_radius", type=int, default=7,
                   help="sliding pos-bias radius for --pos bias "
                        "(reference --posr)")
    p.add_argument("--squeezeuseffn", dest="has_FFN_in_squeeze",
                   action="store_true",
                   help="enable the FFN inside the squeeze (attractor) "
                        "attention (reference --squeezeuseffn)")
    p.add_argument("--locprob", dest="localization_prob", type=float,
                   default=0.0,
                   help="probability of mask-guided localization crop at "
                        "load (reference --locprob, datasets2d.py:289-311)")
    p.add_argument("--exclusive", dest="use_exclusive_masks",
                   action="store_true",
                   help="train on exclusive (non-nested) fundus masks "
                        "(reference --exclusive)")
    p.add_argument("--supweight", dest="supervised_w", type=float,
                   default=1.0,
                   help="weight of the supervised loss vs domain/recon "
                        "(reference --supweight, train2d.py:1313-1318)")
    p.add_argument("--sourcebs", dest="source_batch_size", type=int,
                   default=-1,
                   help="batch size of the source-domain loader for "
                        "adversarial DA (reference --sourcebs; -1 = --bs)")
    p.add_argument("--optfilter", dest="opt_filters", default=None,
                   help="comma-separated substrings; only matching param "
                        "paths are optimized (reference --optfilter, "
                        "train2d.py:453-458)")
    p.add_argument("--opt", dest="opt_name", default="bertadam",
                   choices=["bertadam", "adamw", "sgd", "adam"],
                   help="optimizer (reference --opt; adamw == bertadam)")
    p.add_argument("--tunebn", dest="tune_bn_only", action="store_true",
                   help="only adapt BatchNorm statistics of a loaded "
                        "checkpoint; no gradient updates (reference "
                        "--tunebn, train2d.py:747-751,1089-1104)")
    p.add_argument("--robustaug", dest="robust_aug_types", default=None,
                   help="training-time robustness augmentation: "
                        "'brightness' and/or 'contrast', comma-separated "
                        "(reference --robustaug, train_util.py:66-81)")
    p.add_argument("--robustaugdeg", dest="robust_aug_degrees",
                   default="0.5,1.5",
                   help="robustness-aug degree range (reference "
                        "--robustaugdeg)")
    p.add_argument("--reshape", dest="reshape_mask_type", default=None,
                   choices=[None, "rectangle"],
                   help="mask-shape bias probe: train on masks whose "
                        "channel-0 value-255 region is replaced by its "
                        "min-area rectangle (reference --reshape, "
                        "test2d.py:140-142, datasets2d.py:253-270)")
    p.add_argument("--attndiag", dest="attn_diag_cycles", type=int,
                   default=0,
                   help="log max-attn/avg-attn/clamp-count every N iters "
                        "(reference attn_diag_cycles=500, "
                        "segtran_shared.py:582-587); 0 disables")
    p.add_argument("--attnconsist", dest="use_attn_consist_loss",
                   action="store_true")
    p.add_argument("--attnconsistweight", dest="attn_consist_w", type=float,
                   default=0.01)
    p.add_argument("--vcdr", dest="vcdr_estim_scheme", default="none",
                   choices=["none", "single", "sep"],
                   help="learned vCDR estimator scheme, fundus only "
                        "(reference train2d.py:150-163): 'single' trains one "
                        "estimator CNN on the predicted probs, 'sep' trains "
                        "separate cup/disc estimators whose ratio is the vCDR")
    p.add_argument("--vcdrweight", dest="vcdr_w", type=float, default=0.01)
    p.add_argument("--vcdrestimstart", dest="vcdr_estim_start", type=int,
                   default=1000,
                   help="iteration to start the estimator loss (reference "
                        "train2d.py:158-159)")
    p.add_argument("--vcdrnetstart", dest="vcdr_net_start", type=int,
                   default=1100,
                   help="iteration to start the net vCDR loss (reference "
                        "train2d.py:161-162)")
    p.add_argument("--contrastweight", dest="contrast_loss_w", type=float,
                   default=0.0,
                   help="CONTRAST_LOSS_W: weight of the reference-feature "
                        "contrastive losses (reference internal_util.py:154)")
    p.add_argument("--reffeatcp", dest="ref_feat_cp_path", default=None,
                   help="per-pixel feature dump (.npz from test2d "
                        "--savefeat, or reference-format .pth) used as the "
                        "class-wise reference bank "
                        "(reference internal_util.py:99-125)")
    p.add_argument("--numreffeat", dest="num_ref_features", type=int,
                   default=1000)
    p.add_argument("--numcontrastfeat", dest="num_contrast_features",
                   type=int, default=500,
                   help="accepted for reference parity; the jit formulation "
                        "computes the exact mask-weighted statistic instead "
                        "of subsampling (train/contrast.py)")
    p.add_argument("--refclasses", dest="selected_ref_classes", default=None,
                   help="comma-separated class ids to keep in the bank")
    p.add_argument("--negcontrast", dest="do_neg_contrast",
                   action="store_true")
    p.add_argument("--sourceopt", dest="poly_source_opt", default="allpoly")
    p.add_argument("--targetopt", dest="poly_target_opt", default="k")
    p.add_argument("--bnopt", dest="bn_opt_scheme", default=None,
                   choices=[None, "affine", "fixstats"])
    p.add_argument("--sample", dest="sample_num", type=int, default=-1,
                   help="few-shot: number of training shots")
    p.add_argument("--cp", dest="checkpoint_path", default=None)
    p.add_argument("--ckptdir", default="./model")
    p.add_argument("--origsize", dest="orig_input_size", default=None,
                   help="override task orig_input_size, e.g. 576 or 576,576")
    p.add_argument("--patchsize", dest="patch_size", default=None,
                   help="override task patch_size (model input)")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--ndevices", type=int, default=-1)
    p.add_argument("--tp", dest="tensor_parallel", type=int, default=1,
                   help="model-axis size for tensor-parallel weight "
                        "sharding (2D data x model mesh)")
    p.add_argument("--ep", dest="expert_parallel", action="store_true",
                   help="with --tp: shard the per-mode (expert) private "
                        "weights on their mode dim so each chip computes "
                        "whole modes (parallel/expert.py)")
    p.add_argument("--fused", dest="use_fused_attention",
                   action="store_true",
                   help="Pallas flash attention forward+backward in the "
                        "squeezed transformer (wins for large token counts)")
    p.add_argument("--fusedepi", dest="use_fused_epilogue",
                   action="store_true",
                   help="Pallas fused private-output+LN+mode-pool epilogue "
                        "(inference-only fast path; inert while training)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (recommended on TPU)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations (bigger batches in HBM)")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--rematblocks", dest="remat_blocks",
                   action="store_true", default=None,
                   help="force per-MBConv-block rematerialization of the "
                        "CNN backbone ON (exact numerics, the backward "
                        "recomputes block internals instead of streaming "
                        "~128GB of BN/silu/SE intermediates from HBM)")
    g.add_argument("--norematblocks", dest="remat_blocks",
                   action="store_false",
                   help="force per-MBConv-block rematerialization OFF "
                        "(much faster cold compile). Default is adaptive: "
                        "ON for per-device batch < 12, where it wins +12%% "
                        "steps/s against XLA's small-batch conv spatial "
                        "blocking; OFF at >= 12, where the blocking "
                        "disappears and remat only adds recompute (round-5 "
                        "bs sweep, tools/prof/_prof_bs_train.py)")
    p.add_argument("--gradaccum", dest="grad_accum", type=int, default=1,
                   help="accumulate gradients over N microbatches per step "
                        "(exact full-batch mean; activation memory of one "
                        "microbatch; --bs must be divisible by N)")
    p.add_argument("--scanblocks", dest="scan_blocks", action="store_true",
                   help="lax.scan over identical EfficientNet MBConv repeats"
                        " (smaller HLO, faster first compile; same eval "
                        "numerics; checkpoints adapt on load)")
    p.add_argument("--profile", action="store_true",
                   help="print params/FLOPs/FPS before training (reference "
                        "train2d.py:1048-1062)")
    return p


def load_stats(args, ds_name):
    """Per-dataset normalization stats, auto-selected by task + --gray alpha
    like the reference (train2d.py:406-414); --stats overrides."""
    from ..data.stats import load_dataset_stats
    return load_dataset_stats(args.task_name, getattr(args, "gray_alpha", 0.5),
                              ds_name, stats_json=args.stats_json)


def build_model_and_config(args, task):
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.net == "segtran":
        net_set = NET_SETTINGS["segtran"]
        num_modes = args.num_modes if args.num_modes != -1 else \
            net_set["num_modes"].get(args.in_fpn_layers, 4)
        dropout = args.dropout_prob if args.dropout_prob >= 0 else \
            net_set["dropout_prob"].get(args.in_fpn_layers, 0.2)
        compress = tuple(
            float(x) for x in (args.translayer_compress_ratios or
                               ",".join(["1"] * (args.num_translayers + 1))
                               ).split(","))
        cfg = Segtran2dConfig(
            backbone_type=args.backbone_type,
            num_classes=task["num_classes"],
            num_attractors=args.num_attractors,
            num_modes=num_modes,
            qk_have_bias=args.qk_have_bias,
            use_squeezed_transformer=args.use_squeezed_transformer,
            ablate_multihead=args.ablate_multihead,
            use_attn_consist_loss=args.use_attn_consist_loss,
            attn_clip=getattr(args, "attn_clip", 500.0),
            use_global_bias=getattr(args, "use_global_bias", False),
            in_fpn_use_bn=getattr(args, "in_fpn_use_bn", False),
            out_fpn_do_dropout=getattr(args, "out_fpn_do_dropout", False),
            bb_feat_upsize=getattr(args, "bb_feat_upsize", True),
            pos_code_weight=getattr(args, "pos_code_weight", 1.0),
            pos_bias_radius=getattr(args, "pos_bias_radius", 7),
            has_FFN_in_squeeze=getattr(args, "has_FFN_in_squeeze", False),
            attn_diag=getattr(args, "attn_diag_cycles", 0) > 0,
            use_fused_attention=getattr(args, "use_fused_attention", False),
            use_fused_epilogue=getattr(args, "use_fused_epilogue", False),
            remat=getattr(args, "remat", False),
            remat_blocks=bool(getattr(args, "remat_blocks", False)),
            scan_blocks=getattr(args, "scan_blocks", False),
            pos_code_type=args.pos_code_type,
            use_mince_transformer=getattr(args, "use_mince_transformer",
                                          False),
            mince_scales=tuple(
                int(s) for s in args.mince_scales.split(","))
            if getattr(args, "mince_scales", None) else None,
            mince_channel_props=tuple(
                float(s) for s in args.mince_channel_props.split(","))
            if getattr(args, "mince_channel_props", None) else None,
            in_fpn_layers=tuple(int(c) for c in args.in_fpn_layers),
            out_fpn_layers=tuple(int(c) for c in args.out_fpn_layers),
            hidden_dropout_prob=dropout,
            attention_probs_dropout_prob=dropout,
            dtype=dtype,
        ).derive(translayer_compress_ratios=compress)
        return Segtran2d(cfg), cfg
    nc = task["num_classes"]
    if args.net == "unet-scratch":
        model = VanillaUNet(n_channels=3, num_classes=nc,
                            polyformer_mode=args.polyformer_mode,
                            num_attractors=args.num_attractors,
                            num_modes=4 if args.num_modes == -1
                            else args.num_modes,
                            bn_eval=(args.bn_opt_scheme == "fixstats"),
                            dtype=dtype)
        return model, None
    def resnet_bb():
        # resnet-hybrid nets: keep a resnet --bb, else fall back to resnet50
        # (and say so -- the user may have left the segtran default eff-b4)
        if args.backbone_type.startswith("resnet"):
            return args.backbone_type
        print(f"--net {args.net} needs a resnet backbone; ignoring "
              f"--bb {args.backbone_type} and using resnet50")
        return "resnet50"

    # baseline zoo (reference --net dispatch, train2d.py:933-1032)
    if args.net in ("unet", "unet-smp"):
        from ..models.unet_smp import UnetSMP
        return UnetSMP(num_classes=nc, encoder=args.backbone_type,
                       dtype=dtype), None
    if args.net == "nestedunet":
        from ..models.nested_unet import NestedUNet
        return NestedUNet(num_classes=nc, dtype=dtype), None
    if args.net == "unet3plus":
        from ..models.unet_3plus import UNet3Plus
        return UNet3Plus(num_classes=nc, dtype=dtype), None
    if args.net in ("attunet", "r2attunet"):
        from ..models.att_unet import AttUNet
        return AttUNet(num_classes=nc, use_attention=True,
                       recurrent=(args.net == "r2attunet"),
                       dtype=dtype), None
    if args.net == "dunet":
        from ..models.dunet import DUNetV1V2
        return DUNetV1V2(n_classes=nc, dtype=dtype), None
    if args.net == "transunet":
        from ..models.transunet import TransUNet
        return TransUNet(num_classes=nc, backbone=resnet_bb(),
                         dtype=dtype), None
    if args.net == "setr":
        from ..models.setr import SETR_PUP
        return SETR_PUP(num_classes=nc, dtype=dtype), None
    if args.net == "deeplabv3":
        from ..models.deeplab import DeepLabV3
        return DeepLabV3(num_classes=nc, backbone=resnet_bb(),
                         dtype=dtype), None
    if args.net in ("deeplabv3plus", "deeplab-smp"):
        from ..models.deeplab import DeepLabV3Plus
        return DeepLabV3Plus(num_classes=nc, backbone=resnet_bb(),
                             dtype=dtype), None
    if args.net == "pranet":
        return _PraNetForTraining(num_classes=nc - 1, dtype=dtype), None
    if args.net == "nnunet":
        from ..models.generic_unet import GenericUNet
        return GenericUNet(num_classes=nc, deep_supervision=False,
                           dtype=dtype), None
    raise ValueError(f"unknown --net {args.net}")


class _PraNetForTraining:
    """PraNet returns 4 single-channel lateral maps; the reference trains on
    lateral_map_2 with a zero background channel prepended
    (train2d.py:1207-1214). Wrap it so the trainer sees standard logits."""

    def __init__(self, num_classes, dtype):
        from ..models.pranet import PraNet
        self.net = PraNet(num_classes=num_classes, dtype=dtype)

    def init(self, *a, **kw):
        return self.net.init(*a, **kw)

    def apply(self, variables, x, train=False, **kw):
        import jax.numpy as jnp
        res = self.net.apply(variables, x, train=train, **kw)
        if isinstance(res, tuple) and isinstance(res[0], tuple):
            outs, mstate = res[0], res[1]
            lat2 = outs[3]
            bg = jnp.zeros_like(lat2[..., :1])
            return jnp.concatenate([bg, lat2], axis=-1), mstate
        lat2 = res[3]
        bg = jnp.zeros_like(lat2[..., :1])
        return jnp.concatenate([bg, lat2], axis=-1)


def _grid_hw(inter):
    """The real (h2, w2) FPN token grid, from the sown spatial in_fpn_feat --
    non-square tasks (e.g. oct 288x512) must NOT assume sqrt(N) (round-1
    square-grid bug)."""
    t = inter.get("intermediates", inter)
    if "in_fpn_feat" in t:
        f = t["in_fpn_feat"][0]
        return f.shape[1], f.shape[2]
    return None


def _da_feature(inter):
    """The reference's net.feature_maps[-1] (train2d.py:1259-1286): the last
    transformer layer's tokens, reshaped onto the real FPN grid."""
    t = inter.get("intermediates", inter)
    if "pre_outc_feat" in t:
        return t["pre_outc_feat"][0]
    vf = t.get("voxel_fusion", {})
    layer_keys = sorted((k for k in vf if k.startswith("layer_")
                         and k.endswith("_vfeat")),
                        key=lambda k: int(k.split("_")[1]))
    if layer_keys:
        feat = vf[layer_keys[-1]][0]   # [B, N, C]
        n = feat.shape[1]
        hw = _grid_hw(inter)
        if hw is None:
            side = int(n ** 0.5)
            hw = (side, n // side)
        return feat.reshape(feat.shape[0], hw[0], hw[1], -1)
    return t["in_fpn_feat"][0]


def make_full_step(model, tx, task, args, aug_cfg, patch_size,
                   disc_model=None, recon_model=None, vcdr_models=None,
                   contrast_bank=None, ds_stats=None, src_stats=None):
    """Train step over RAW batches: on-device label map -> augment ->
    downscale to patch_size -> model -> loss [+ attention consistency,
    reconstruction, domain-adversarial, vCDR-estimation losses -- reference
    train2d.py:1228-1318].

    With DA/recon/vCDR, state.params is {'net', 'discriminator'?, 'recon'?,
    'vcdr_estim'? | 'vc_estim'?+'vd_estim'?} and state.batch_stats mirrors
    that split.
    """
    import optax
    from ..train.contrast import calc_contrast_losses
    from ..train.da import (attention_consistency_loss, collect_attn_diag,
                            collect_attn_scores, domain_adversarial_loss,
                            vcdr_estimation_losses)
    loss_fn = make_loss_fn(task["num_classes"], task["bce_weight"],
                           dice_w=args.max_dice_w,
                           focus_class=args.focus_class)
    task_name = args.task_name
    has_aux = (disc_model is not None or recon_model is not None
               or bool(vcdr_models))
    grad_accum = max(1, int(getattr(args, "grad_accum", 1)))
    if grad_accum > 1 and (has_aux or contrast_bank is not None
                           or args.use_attn_consist_loss):
        # source-domain batches / feature banks are whole-batch structures,
        # and the 2D attn-consistency loss is batch-joint (shared
        # cnt=sum(inconsistent) denominator + cap-at-1, da.py); microbatching
        # them is a different algorithm, not an optimization
        raise ValueError("--gradaccum > 1 is supported for the supervised "
                         "path only (no DA/recon/vCDR/contrast/attnconsist)")
    attn_diag_on = getattr(args, "attn_diag_cycles", 0) > 0
    need_inter = (disc_model is not None and args.adversarial_mode == "feat") \
        or args.use_attn_consist_loss or recon_model is not None \
        or contrast_bank is not None or attn_diag_on

    def map_mask(raw_mask):
        if task_name == "fundus":
            return fundus_map_mask(
                raw_mask,
                exclusive=getattr(args, "use_exclusive_masks", False))
        if task_name == "polyp":
            return polyp_map_mask(raw_mask)
        return index_to_onehot(raw_mask[..., 0], task["num_classes"])

    def run_net(params, bstats, image, drng):
        variables = {"params": params}
        if bstats is not None:
            variables["batch_stats"] = bstats
        mutable = ["batch_stats"]
        if need_inter:
            mutable.append("intermediates")
        out, mstate = model.apply(variables, image, train=True,
                                  rngs={"dropout": drng}, mutable=mutable)
        return out, mstate.get("batch_stats", {}), mstate

    def step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step + 77)
        mask = map_mask(batch["mask"])
        if ds_stats is not None and "ds_idx" in batch:
            # per-sample stats lookup: each sample normalizes with its own
            # dataset's (mean, std) as the reference does by constructing one
            # transform per ds_name (train_util.py:100-106)
            mu = jnp.asarray(ds_stats[0])[batch["ds_idx"]]
            sd = jnp.asarray(ds_stats[1])[batch["ds_idx"]]
            image, mask = augment_batch_2d(rng, batch["image"], mask,
                                           aug_cfg, mu, sd)
        else:
            image, mask = augment_batch_2d(rng, batch["image"], mask, aug_cfg)
        image_small = resize_linear(image, patch_size)
        drng = jax.random.fold_in(rng, 1)
        if "source_image" in batch and disc_model is not None:
            # the DA source domain gets ITS OWN stats (reference
            # train2d.py:884-918 builds the source loader with the source
            # ds_name's transform), not the target's
            src_mu, src_sd = src_stats if src_stats is not None else \
                (None, None)
            src_aug, _ = augment_batch_2d(
                jax.random.fold_in(rng, 3), batch["source_image"],
                jnp.zeros(batch["source_image"].shape[:3] + (1,)), aug_cfg,
                src_mu, src_sd)
            batch = dict(batch, source_image=src_aug)

        # image_small/mask/drng are bound as defaults so --gradaccum can call
        # the SAME loss on microbatch slices; bstats_in threads BatchNorm
        # state sequentially through the accumulation scan
        def compute_loss(params, image_small=image_small, mask=mask,
                         drng=drng, bstats_in=None):
            net_params = params["net"] if has_aux else params
            net_bstats = (bstats_in if bstats_in is not None else
                          (state.batch_stats.get("net")
                           if has_aux else state.batch_stats))
            logits, new_bstats, mstate = run_net(net_params, net_bstats,
                                                 image_small, drng)
            loss, metrics = loss_fn(logits, mask)
            all_bstats = new_bstats
            if attn_diag_on:
                diag = collect_attn_diag(mstate)
                if diag is not None:
                    metrics["attn_max"] = diag[0]
                    metrics["attn_avg"] = diag[1]
                    metrics["attn_clamped"] = diag[2]
            if args.use_attn_consist_loss:
                scores = collect_attn_scores(mstate)
                if scores:
                    hw = _grid_hw(mstate)
                    if hw is None:
                        feat_n = scores[-1][1].shape[-2] if isinstance(
                            scores[-1], tuple) else scores[-1].shape[-1]
                        side = int(feat_n ** 0.5)
                        hw = (side, feat_n // side)
                    ac = attention_consistency_loss(scores, mask, hw)
                    loss = loss + args.attn_consist_w * ac
                    metrics["attn_consist_loss"] = ac
            if contrast_bank is not None:
                # reference-feature contrastive losses (reference
                # calc_contrast_losses, internal_util.py:154-194). The
                # reference caller passes an EXCLUSIVE mask; for fundus the
                # nested disc channel is made exclusive of cup here. The
                # trainer wiring is absent from the public snapshot, so the
                # pos-minus-neg combination is our choice (pull toward the
                # same-class bank, push from a random other class's bank).
                bank, bank_valid, contrast_cls_w = contrast_bank
                if task_name == "fundus":
                    ex_mask = jnp.concatenate(
                        [mask[..., :1],
                         mask[..., 1:2] * (1 - mask[..., 2:3]),
                         mask[..., 2:3]], -1)
                else:
                    ex_mask = mask
                feat_c = _da_feature(mstate)
                pos_cl, neg_cl = calc_contrast_losses(
                    feat_c, ex_mask, bank, bank_valid, contrast_cls_w,
                    rng=jax.random.fold_in(rng, 5),
                    do_neg_contrast=args.do_neg_contrast)
                loss = loss + args.contrast_loss_w * (pos_cl - neg_cl)
                metrics["contrast_pos_loss"] = pos_cl
                if args.do_neg_contrast:
                    metrics["contrast_neg_loss"] = neg_cl
            # supervised vs unsupervised weighting (reference --supweight,
            # train2d.py:1313-1318: supervised = seg + vcdr + attnconsist;
            # domain/recon stay unscaled)
            sup_w = getattr(args, "supervised_w", 1.0)
            if sup_w != 1.0:
                loss = sup_w * loss
            if has_aux:
                all_bstats = {"net": new_bstats}
            if disc_model is not None or recon_model is not None:
                feat_t = _da_feature(mstate)
                if recon_model is not None:
                    reconed = recon_model.apply(
                        {"params": params["recon"]}, feat_t)
                    reconed = resize_linear(reconed.astype(jnp.float32),
                                            image_small.shape[1:3])
                    rl = jnp.mean((reconed - image_small) ** 2)
                    loss = loss + args.recon_w * rl
                    metrics["recon_loss"] = rl
                if disc_model is not None:
                    src_img = resize_linear(batch["source_image"],
                                            patch_size)
                    src_logits, src_bstats, s_mstate = run_net(
                        net_params, net_bstats, src_img,
                        jax.random.fold_in(rng, 2))
                    if args.adversarial_mode == "feat":
                        feat_s = _da_feature(s_mstate)
                    else:  # 'mask'
                        feat_s = jax.nn.sigmoid(src_logits)
                        feat_t = jax.nn.sigmoid(logits)

                    def disc_apply(v, d_params):
                        out, dstats = disc_model.apply(
                            {"params": d_params,
                             "batch_stats":
                                 state.batch_stats.get("discriminator", {})},
                            v, train=True, mutable=["batch_stats"])
                        disc_apply.dstats = dstats["batch_stats"]
                        return out

                    if args.adda:
                        # ADDA (reference train2d.py:1070-1073, 1278-1283):
                        # a dedicated BertAdam trains the discriminator on
                        # the UNSCALED domain loss at full LR, then the
                        # generator trains against the pre-update
                        # discriminator with flipped labels, scaled by
                        # DOMAIN_LOSS_W. Folded into one step: d_loss sees
                        # detached features + live disc params (-> unscaled
                        # disc-only grads, same BertAdam schedule as the
                        # reference's discriminator_optim), g_loss sees live
                        # features + frozen disc params (-> domweight-scaled
                        # net-only grads). Deviation: the reference's main
                        # optimizer also leaks a domweight(=0.002)-scaled
                        # second disc update from the flipped-label loss;
                        # freezing disc in g_loss drops that epsilon.
                        d_loss = domain_adversarial_loss(
                            lambda v: disc_apply(
                                v, params["discriminator"]),
                            jax.lax.stop_gradient(feat_s),
                            jax.lax.stop_gradient(feat_t))
                        frozen = jax.lax.stop_gradient(
                            params["discriminator"])
                        g_loss = domain_adversarial_loss(
                            lambda v: disc_apply(v, frozen),
                            feat_t, feat_s)  # flipped labels
                        loss = loss + d_loss + args.domain_loss_w * g_loss
                        metrics["disc_loss"] = d_loss
                        metrics["domain_loss"] = g_loss
                    else:
                        dl = domain_adversarial_loss(
                            lambda v: disc_apply(
                                v, params["discriminator"]),
                            feat_s, feat_t)
                        loss = loss + args.domain_loss_w * dl
                        metrics["domain_loss"] = dl
                    all_bstats["discriminator"] = disc_apply.dstats
            if vcdr_models:
                # learned vCDR estimation losses (reference
                # train2d.py:1288-1312); start-iteration gates become 0/1
                # multipliers on the traced step counter
                probs_full = jax.nn.sigmoid(resize_linear(
                    logits, mask.shape[1:3]).astype(jnp.float32))
                vstats_out = {}

                def estimate(x):
                    """reference estimate_vcdr (train2d.py:655-664)."""
                    preds = []
                    for nm, m in vcdr_models.items():
                        out, vst = m.apply(
                            {"params": params[nm],
                             "batch_stats": state.batch_stats.get(nm, {})},
                            x, train=True, mutable=["batch_stats"])
                        vstats_out[nm] = vst["batch_stats"]
                        preds.append(out[:, 0])
                    raw = (preds[0] / (preds[1] + 1e-6) if len(preds) == 2
                           else preds[0])
                    return jax.nn.sigmoid(raw)

                vl = vcdr_estimation_losses(estimate, probs_full, mask)
                on_estim = (state.step >= args.vcdr_estim_start).astype(
                    jnp.float32)
                on_net = (state.step >= args.vcdr_net_start).astype(
                    jnp.float32)
                vcdr_loss = on_estim * (vl["vcdr_estim_loss"]
                                        + on_net * vl["vcdr_net_loss"])
                loss = loss + sup_w * args.vcdr_w * vcdr_loss
                metrics["vcdr_loss"] = vcdr_loss
                metrics["vcdr_estim_loss"] = vl["vcdr_estim_loss"]
                metrics["vcdr_net_loss"] = vl["vcdr_net_loss"]
                for nm in vcdr_models:
                    all_bstats[nm] = vstats_out[nm]
            metrics["loss"] = loss
            # small previews for TensorBoard image grids (reference logs
            # input/pred/gt grids every 50 iters, train2d.py:1354-1372)
            prev = resize_linear(jax.nn.sigmoid(
                logits[:1].astype(jnp.float32)), (72, 72))
            metrics["_preview_pred"] = prev[0]
            metrics["_preview_img"] = resize_linear(
                image_small[:1].astype(jnp.float32), (72, 72))[0]
            metrics["_preview_gt"] = resize_linear(
                mask[:1].astype(jnp.float32), (72, 72))[0]
            return loss, (metrics, all_bstats)

        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        if grad_accum > 1:
            # split the (already augmented) batch into microbatches and scan:
            # activation memory is one microbatch's, gradients average to the
            # exact full-batch mean (losses are per-example means)
            a = grad_accum
            img_mb = image_small.reshape(
                (a, image_small.shape[0] // a) + image_small.shape[1:])
            msk_mb = mask.reshape((a, mask.shape[0] // a) + mask.shape[1:])

            def body(carry, inp):
                gsum, bstats = carry
                img_i, msk_i, i = inp
                (_, (m, nb)), g = grad_fn(
                    state.params, img_i, msk_i,
                    jax.random.fold_in(drng, i + 1), bstats)
                return (jax.tree_util.tree_map(jnp.add, gsum, g), nb), m

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_bstats), ms = jax.lax.scan(
                body, (gzero, state.batch_stats),
                (img_mb, msk_mb, jnp.arange(a)))
            grads = jax.tree_util.tree_map(lambda g: g / a, gsum)
            metrics = {k: (v[0] if k.startswith("_preview") else
                           jnp.mean(v, 0)) for k, v in ms.items()}
        else:
            (_, (metrics, new_bstats)), grads = grad_fn(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bstats,
                             opt_state=new_opt_state), metrics

    return step


def resolve_remat_blocks(batch_size, grad_accum, n_devices, tensor_parallel):
    """Adaptive remat_blocks default (round-5 bs sweep,
    tools/prof/_prof_bs_train.py): per-MBConv remat wins only while XLA's
    small-batch conv spatial blocking dominates the backward (per-device
    microbatch < 12: 34.3 -> 38.4 imgs/s at bs 6); at >= 12 the blocking
    disappears and remat only adds recompute (61.3 -> 54.6 at bs 12) plus
    an ~11-min cold compile. Returns (remat_blocks, per_device_microbatch)."""
    dp = max(n_devices // max(tensor_parallel, 1), 1)
    mb = max(batch_size // max(grad_accum, 1) // dp, 1)
    return mb < 12, mb


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # cross-host init first (no-op on one host): reads JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID (README 'Multi-host training';
    # replaces reference dist.init_process_group, train2d.py:796-801)
    from ..parallel.multihost import init_multihost
    init_multihost(verbose=True)
    # resolved once: a jax.devices() call is a potential pool-grant wait
    n_dev = args.ndevices if args.ndevices > 0 else len(jax.devices())
    if args.tensor_parallel > 1 and n_dev % args.tensor_parallel:
        # fail before the multi-minute model init
        raise ValueError(f"--tp {args.tensor_parallel} must divide "
                         f"device count {n_dev}")
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        raise ValueError(f"--gradaccum {args.grad_accum} must divide "
                         f"--bs {args.batch_size}")
    if args.grad_accum > 1 and args.use_attn_consist_loss:
        # fail fast (before the multi-minute model init); make_full_step
        # enforces the same rule for the model-dependent aux losses
        raise ValueError("--gradaccum > 1 is incompatible with "
                         "--attnconsist: the 2D attention-consistency loss "
                         "is batch-joint (shared inconsistent-count "
                         "denominator), so microbatching changes its value")
    if args.grad_accum > 1:
        # each microbatch is itself sharded over the data axis; a microbatch
        # not divisible by it forces GSPMD resharding/replication, erasing
        # the memory benefit (or failing at trace time)
        _dp = n_dev // max(args.tensor_parallel, 1)
        if (args.batch_size // args.grad_accum) % _dp:
            raise ValueError(
                f"microbatch size {args.batch_size // args.grad_accum} "
                f"(--bs {args.batch_size} / --gradaccum {args.grad_accum}) "
                f"must be divisible by the data-parallel device count {_dp}")
    task = dict(TASK_SETTINGS[args.task_name])
    for field, override in (("orig_input_size", args.orig_input_size),
                            ("patch_size", args.patch_size)):
        if override:
            vals = tuple(int(v) for v in str(override).split(","))
            task[field] = vals * 2 if len(vals) == 1 else vals
    ds_names = (args.ds_names.split(",") if args.ds_names
                else list(task["ds_names"]))
    job = f"{args.net}-{args.task_name}-{','.join(ds_names)}-" \
          f"{time.strftime('%m%d%H%M')}"
    ckpt_dir = os.path.join(args.ckptdir, job)
    logger = setup_logging(ckpt_dir)
    logger.info("args: %s", vars(args))
    if getattr(args, "remat_blocks", None) is None:
        args.remat_blocks, _mb = resolve_remat_blocks(
            args.batch_size, args.grad_accum, n_dev, args.tensor_parallel)
        logger.info("remat_blocks auto -> %s (per-device microbatch %d; "
                    "force with --rematblocks/--norematblocks)",
                    args.remat_blocks, _mb)

    # ---- data ----
    ds_cls = {"SegCrop": SegCrop, "SegWhole": SegWhole}[task["ds_class"]]
    datasets = []
    for name in ds_names:
        datasets.append(ds_cls(
            base_dir=os.path.join(args.dataroot, args.task_name, name),
            split=args.split, sample_num=args.sample_num,
            mask_num_classes=task["num_classes"],
            binarize=task.get("binarize", False),
            has_mask=task.get("has_mask", {}).get(name, True),
            ds_weight=task.get("ds_weight", {}).get(name, 1.0),
            uncropped_size=task.get("uncropped_size", {}).get(name, -1),
            reshape_mask_type=getattr(args, "reshape_mask_type", None),
            train_loc_prob=getattr(args, "localization_prob", 0.0),
            min_output_size=task["orig_input_size"],
            out_size=task["orig_input_size"], seed=args.seed))
    dataset = ConcatDataset(datasets) if len(datasets) > 1 else datasets[0]
    logger.info("%d training samples", len(dataset))
    # one (mean, std) per dataset, like the reference's per-ds_name transform
    # dict (train_util.py:100-106); the first ds seeds the static Aug2dConfig
    # (single-ds runs and the eval-side default), multi-ds runs get a
    # [D, C] lookup table indexed by the per-sample ds_idx
    all_stats = [load_stats(args, name) for name in ds_names]
    mean, std = all_stats[0]
    ds_stats = None
    if len(ds_names) > 1:
        ds_stats = (np.asarray([s[0] for s in all_stats], np.float32),
                    np.asarray([s[1] for s in all_stats], np.float32))
        for name, (m_i, s_i) in zip(ds_names, all_stats):
            logger.info("normalization stats for %s: mean=%s std=%s",
                        name, m_i, s_i)
    rdeg = tuple(float(v) for v in
                 str(getattr(args, "robust_aug_degrees", "0.5,1.5")
                     ).split(","))
    if len(rdeg) == 1:
        rdeg = rdeg * 2      # reference train2d.py:433-435
    aug_cfg = Aug2dConfig(
        randscale=args.randscale, gray_alpha=args.gray_alpha,
        do_affine=getattr(args, "do_affine", False),
        robust_aug=tuple(
            t for t in str(getattr(args, "robust_aug_types", "") or ""
                           ).split(",") if t),
        robust_aug_range=rdeg, mean=mean, std=std)

    # ---- model / optimizer ----
    model, cfg = build_model_and_config(args, task)
    if getattr(args, "use_fused_attention", False) and cfg is not None \
            and cfg.attention_probs_dropout_prob > 0:
        # attention.py gates the fused path on deterministic-or-no-dropout;
        # with attention dropout the XLA path runs every training step
        logger.warning("--fused is inert during training with attention "
                       "dropout %.2f; pass --dropout 0 to engage the flash "
                       "kernels", cfg.attention_probs_dropout_prob)
    net_set = NET_SETTINGS.get(args.net, NET_SETTINGS["unet-like"])
    lr = args.lr if args.lr > 0 else net_set["lr"]
    decay = args.decay if args.decay >= 0 else net_set["decay"]
    grad_clip = args.grad_clip if args.grad_clip > 0 else net_set["grad_clip"]
    warmup_ratio = min(args.lr_warmup_steps, args.maxiter // 2) / args.maxiter

    sample = dataset[0]
    example = jnp.zeros((1,) + tuple(task["patch_size"]) + (3,), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(args.seed)}, example)
    batch_stats = rest.get("batch_stats", {})

    if args.checkpoint_path:
        from ..nn.backbones.efficientnet import maybe_adapt_scan_layout
        payload = load_checkpoint(args.checkpoint_path, cfg)
        want_scan = getattr(cfg, "scan_blocks", False)
        loaded_p = maybe_adapt_scan_layout(
            payload.get("params", {}), args.backbone_type, want_scan)
        params = merge_params(params, loaded_p)
        if payload.get("batch_stats"):
            batch_stats = merge_params(
                batch_stats, maybe_adapt_scan_layout(
                    payload["batch_stats"], args.backbone_type, want_scan))
        logger.info("loaded checkpoint %s", args.checkpoint_path)

    if args.profile:
        from ..tools.flops import count_params, estimate_flops, measure_fps
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        fwd = lambda v, xx: model.apply(v, xx, train=False)
        logger.info("params: %.2fM", count_params(params) / 1e6)
        costs = estimate_flops(fwd, variables, example)
        logger.info("forward FLOPs: %.2fG, bytes: %.2fM",
                    costs["flops"] / 1e9, costs["bytes"] / 1e6)
        fps = measure_fps(fwd, variables, example, iters=10)
        logger.info("forward FPS (bs=%d): %.2f imgs/s",
                    example.shape[0], fps * example.shape[0])

    if getattr(args, "tune_bn_only", False):
        # --tunebn (reference train2d.py:747-751, 1089-1104): adapt only the
        # BatchNorm statistics of a loaded checkpoint. Gradient updates are
        # zeroed; batch_stats still update through the train step's mutable
        # collection — the functional equivalent of the reference's
        # eval-mode-with-BN-.train() trick.
        import optax
        if not args.checkpoint_path:
            raise SystemExit("--tunebn requires --cp <checkpoint to adapt>")
        tx = optax.set_to_zero()
    elif args.polyformer_mode:
        # param-subset optimization (reference train2d.py:462-503): decay=0,
        # non-selected params frozen via a zero transform
        from ..adapt.polyformer import polyformer_param_labels
        import optax
        from ..train.bertadam import bert_adam
        opt_mode = (args.poly_source_opt if args.polyformer_mode == "source"
                    else args.poly_target_opt)
        labels = partial(polyformer_param_labels, opt_mode=opt_mode,
                         batch_stats=batch_stats,
                         bn_opt_scheme=args.bn_opt_scheme)
        tx = optax.multi_transform(
            {"normal": bert_adam(lr, warmup_ratio, args.maxiter,
                                 weight_decay=0.0),
             "frozen": optax.set_to_zero()},
            labels)
    else:
        import optax
        opt_name = getattr(args, "opt_name", "bertadam")
        if opt_name == "sgd":
            # reference --opt sgd (train2d.py:1064-1065)
            tx = optax.chain(optax.add_decayed_weights(1e-4),
                             optax.sgd(lr, momentum=0.9))
        elif opt_name == "adam":
            # reference --opt adam (train2d.py:1066-1067); torch Adam's
            # weight_decay adds to the gradient before the moment update
            tx = optax.chain(optax.add_decayed_weights(1e-4),
                             optax.scale_by_adam(),
                             optax.scale(-lr))
        else:  # bertadam / adamw
            tx = build_optimizer(lr=lr, decay=decay, t_total=args.maxiter,
                                 warmup_ratio=warmup_ratio,
                                 grad_clip=grad_clip)
        if getattr(args, "opt_filters", None):
            # reference --optfilter (train2d.py:453-458): only params whose
            # path contains one of the substrings are optimized
            from flax import traverse_util
            filters = [f for f in str(args.opt_filters).split(",") if f]

            def filter_labels(params):
                flat = traverse_util.flatten_dict(params)
                lab = {k: ("on" if any(f in "/".join(k) for f in filters)
                           else "off") for k in flat}
                return traverse_util.unflatten_dict(lab)

            tx = optax.multi_transform(
                {"on": tx, "off": optax.set_to_zero()}, filter_labels)

    # ---- auxiliary DA modules (reference train2d.py:884-932) ----
    disc_model = recon_model = vcdr_models = None
    source_dataset = None
    src_stats = None
    use_vcdr = (args.task_name == "fundus"
                and args.vcdr_estim_scheme != "none")
    if args.adversarial_mode or args.recon_w > 0 or use_vcdr:
        import flax.linen as fnn
        if args.net == "unet-scratch":
            feat_ch = 64
        elif args.net == "segtran":
            feat_ch = cfg.trans_out_dim
        else:
            feat_ch = task["num_classes"]
        if args.adversarial_mode == "mask":
            feat_ch = task["num_classes"]
        if args.adversarial_mode:
            from ..models.discriminator import Discriminator
            # ADDA does not use gradient reversal (reference
            # discriminator.py:70-71 do_revgrad=False when adda)
            disc_model = Discriminator(num_classes=1,
                                       do_revgrad=not args.adda)
            d_params, d_rest = init_with_reference_schemes(
                disc_model, {"params": jax.random.PRNGKey(args.seed + 7)},
                jnp.zeros((1, 64, 64, feat_ch), jnp.float32))
            source_dataset = ds_cls(
                base_dir=os.path.join(args.dataroot, args.task_name,
                                      args.source_ds_name),
                split="all", mask_num_classes=task["num_classes"],
                binarize=task.get("binarize", False),
                out_size=task["orig_input_size"], seed=args.seed)
            logger.info("%d source-domain samples for adversarial DA",
                        len(source_dataset))
            # the source domain normalizes with its OWN stats table, not the
            # target's (reference train2d.py:884-918 gives the source loader
            # the source ds_name's transform via train_util.py:100)
            src_stats = load_stats(args, args.source_ds_name)
            logger.info("source-domain stats (%s): mean=%s std=%s",
                        args.source_ds_name, src_stats[0], src_stats[1])
        if args.recon_w > 0:
            class ReconHead(fnn.Module):
                @fnn.compact
                def __call__(self, x):
                    return fnn.Conv(3, (1, 1), name="conv")(x)
            recon_model = ReconHead()
            r_params = recon_model.init(
                jax.random.PRNGKey(args.seed + 8),
                jnp.zeros((1, 8, 8, feat_ch), jnp.float32))["params"]
        if use_vcdr:
            # "Abuse" the domain-discriminator CNN as the learned vCDR
            # estimator (reference train2d.py:1034-1042): one estimator on
            # the predicted probs ('single'), or separate cup/disc
            # estimators whose ratio is the vCDR ('sep')
            from ..models.discriminator import Discriminator
            names = (("vc_estim", "vd_estim")
                     if args.vcdr_estim_scheme == "sep" else ("vcdr_estim",))
            vcdr_models, vcdr_inits = {}, {}
            for i, nm in enumerate(names):
                m = Discriminator(num_classes=1, do_avgpool=True,
                                  do_revgrad=False)
                v_params, v_rest = init_with_reference_schemes(
                    m, {"params": jax.random.PRNGKey(args.seed + 9 + i)},
                    jnp.zeros((1, 64, 64, task["num_classes"]), jnp.float32))
                vcdr_models[nm] = m
                vcdr_inits[nm] = (v_params, v_rest.get("batch_stats", {}))
        params = {"net": params}
        batch_stats = {"net": batch_stats}
        if disc_model is not None:
            params["discriminator"] = d_params
            batch_stats["discriminator"] = d_rest.get("batch_stats", {})
        if recon_model is not None:
            params["recon"] = r_params
        if vcdr_models:
            for nm, (vp, vb) in vcdr_inits.items():
                params[nm] = vp
                batch_stats[nm] = vb

    state = create_train_state(params, batch_stats, tx,
                               jax.random.PRNGKey(args.seed + 1))

    contrast_bank = None
    if args.ref_feat_cp_path:
        from ..train.contrast import load_reference_features
        sel = (tuple(int(v) for v in args.selected_ref_classes.split(","))
               if args.selected_ref_classes else None)
        bank, bank_valid = load_reference_features(
            args.ref_feat_cp_path, args.num_ref_features,
            task["num_classes"], sel, seed=args.seed)
        logger.info("reference feature bank: %s, %d/%d valid",
                    bank.shape, int(bank_valid.sum()), bank_valid.size)
        # the same (num_classes-1)/sum-normalized class weights the BCE uses
        bw = np.asarray(task["bce_weight"], np.float32)
        bw = bw * (task["num_classes"] - 1) / bw.sum()
        contrast_bank = (jnp.asarray(bank), jnp.asarray(bank_valid),
                         jnp.asarray(bw))

    # ---- mesh & step ----
    step_fn = make_full_step(model, tx, task, args, aug_cfg,
                             tuple(task["patch_size"]),
                             disc_model=disc_model, recon_model=recon_model,
                             vcdr_models=vcdr_models,
                             contrast_bank=contrast_bank,
                             ds_stats=ds_stats, src_stats=src_stats)
    tp = max(args.tensor_parallel, 1)
    if tp > 1:
        if n_dev % tp:
            raise ValueError(f"--tp {tp} must divide device count {n_dev}")
        # (data x model) mesh with GSPMD weight sharding of the big kernels;
        # --ep additionally shards the per-mode (expert) weights on their
        # mode dim (parallel/expert.py rationale)
        from ..parallel.tensor_parallel import (shard_state_to_mesh,
                                                shard_train_step_2d)
        mesh = make_mesh(n_dev, axes=("data", "model"),
                         shape=(n_dev // tp, tp))
        ep_modes = (model.cfg.num_modes
                    if args.expert_parallel and hasattr(model, "cfg")
                    else None)
        state, state_spec = shard_state_to_mesh(state, mesh,
                                                expert_dim_size=ep_modes)
        sharded_step = shard_train_step_2d(step_fn, mesh, state_spec,
                                           donate_state=True)
    else:
        mesh = make_mesh(n_dev)
        sharded_step = shard_train_step(step_fn, mesh, donate_state=True)
        state = replicate_to_mesh(state, mesh)
    logger.info("mesh: %s devices (tp=%d), global batch %d", n_dev, tp,
                args.batch_size)

    # ---- TB ----
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(ckpt_dir, "log"))
    except ImportError:
        writer = None

    meters = AverageMeters()
    iter_num = 0
    diag_max, diag_clamp = 0.0, 0
    epoch = 0
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sharding = NamedSharding(mesh, P("data"))
    t0 = time.time()
    def with_source(it):
        """Attach source-domain images for adversarial DA (reference's second
        DataLoader, train2d.py:884-918)."""
        if source_dataset is None:
            yield from it
            return
        src_epoch = 0
        # source-domain batch size (reference --sourcebs, train2d.py:96,913)
        src_bs = getattr(args, "source_batch_size", -1)
        src_bs = args.batch_size if src_bs <= 0 else src_bs
        src_it = batch_iterator(source_dataset, src_bs, src_epoch,
                                seed=args.seed + 5, keys=("image",))
        for batch in it:
            try:
                src = next(src_it)
            except StopIteration:
                src_epoch += 1
                src_it = batch_iterator(source_dataset, src_bs,
                                        src_epoch, seed=args.seed + 5,
                                        keys=("image",))
                src = next(src_it)
            batch["source_image"] = src["image"]
            yield batch

    batch_keys = (("image", "mask", "ds_idx") if ds_stats is not None
                  else ("image", "mask"))
    logger.info(
        "compiling the train step (first step; a COLD compile of the "
        "flagship recipe takes up to ~11 min with remat_blocks on "
        "-- --norematblocks or --scanblocks compile much faster; warm "
        "reruns of unchanged shapes hit the persistent .jax_cache)...")
    while iter_num < args.maxiter:
        it = with_source(batch_iterator(dataset, args.batch_size, epoch,
                                        seed=args.seed,
                                        keys=batch_keys))
        for batch in prefetch_to_device(it, sharding=batch_sharding):
            state, metrics = sharded_step(state, batch)
            iter_num += 1
            previews = {k: v for k, v in metrics.items()
                        if k.startswith("_preview")}
            metrics = {k: v for k, v in metrics.items()
                       if not k.startswith("_preview")}
            for k, v in metrics.items():
                meters.update(k, float(v))
            if iter_num == 1:
                logger.info("first step done in %.1fs (compile + run)",
                            time.time() - t0)
            if writer is not None:
                for k, v in metrics.items():
                    writer.add_scalar(k, float(v), iter_num)
                if iter_num % 50 == 0 and previews:
                    for k, v in previews.items():
                        arr = np.clip(np.asarray(v, np.float32), 0, 1)
                        if arr.shape[-1] > 3:
                            arr = arr[..., :3]
                        elif arr.shape[-1] < 3:
                            arr = np.repeat(arr[..., :1], 3, axis=-1)
                        writer.add_image(k.replace("_preview_", "train/"),
                                         arr, iter_num, dataformats="HWC")
            if args.attn_diag_cycles > 0 and "attn_max" in metrics:
                diag_max = max(diag_max, float(metrics["attn_max"]))
                diag_clamp += int(metrics["attn_clamped"])
                if iter_num % args.attn_diag_cycles == 0:
                    # the reference's periodic diagnostics line
                    # (segtran_shared.py:582-587), with the same reset
                    logger.info("max-attn: %.2f, avg-attn: %.2f, "
                                "clamp-count: %d", diag_max,
                                float(metrics["attn_avg"]), diag_clamp)
                    diag_max, diag_clamp = 0.0, 0
            if iter_num % args.logiter == 0:
                logger.info("iter %d (%.2f it/s): %s", iter_num,
                            iter_num / (time.time() - t0),
                            meters.disp_str(("loss", "ce_loss", "dice_loss")))
                meters.reset_disp()
            if iter_num % args.saveiter == 0 or iter_num >= args.maxiter:
                host_state = jax.device_get(state)
                # async: serialization overlaps the next train steps
                save_checkpoint(ckpt_dir, iter_num, host_state.params,
                                host_state.batch_stats, cfg=cfg,
                                async_save=True)
                logger.info("saved iter_%d", iter_num)
            if iter_num >= args.maxiter:
                break
        epoch += 1
    from ..train.checkpoint import wait_for_saves
    wait_for_saves()
    logger.info("done: %d iters in %.1fs", iter_num, time.time() - t0)
    return ckpt_dir


if __name__ == "__main__":
    main()

"""3D training driver (the reference's code/train3d.py as one jitted graph).

BraTS recipe (reference README.md:23-27):
  python -m segtran_tpu.cli.train3d --task brats --split all --maxiter 10000 \
      --translayers 1 --bs 4 --randscale 0.1 --attractors 1024 \
      --dataroot /path/to/brats_h5
"""
from __future__ import annotations

import argparse
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Segtran3dConfig, Segtran25dConfig
from ..configs.presets import TASK_SETTINGS
from ..data.augment import (random_noise_3d, random_resized_crop_3d,
                            random_rot_flip_3d)
from ..data.datasets3d import BratsSet, AtriaSet, MSDSet
from ..data.labelmaps3d import brats_map_label
from ..data.labelmaps import index_to_onehot
from ..data.pipeline import batch_iterator, prefetch_to_device
from ..models.segtran3d import Segtran3d
from ..models.segtran25d import Segtran25d
from ..nn.init import init_with_reference_schemes
from ..ops.resize import resize_linear
from ..parallel.mesh import (make_mesh, replicate_to_mesh, shard_train_step)
from ..train.checkpoint import save_checkpoint, load_checkpoint, merge_params
from ..train.trainer import (build_optimizer, create_train_state,
                             make_train_step)
from ..ops.losses import dice_loss_indiv, weighted_bce_with_logits
from ..utils import AverageMeters, setup_logging


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", dest="task_name", default="brats",
                   choices=["brats", "atria", "msd"])
    p.add_argument("--ds", dest="ds_name", default=None,
                   help="dataset dir under dataroot/<task>/ "
                        "(default: 2019train for brats, train otherwise)")
    p.add_argument("--nclasses", dest="num_classes", type=int, default=-1,
                   help="override the task's class count (MSD tasks vary)")
    p.add_argument("--mod", dest="chosen_modality", type=int, default=-1,
                   help="modality channel to use when volumes are "
                        "multi-modality (-1 = all; reference test3d.py:112)")
    p.add_argument("--xyzpermute", dest="xyz_permute", default=None,
                   help="spatial axis permutation, e.g. 1,2,0 (reference "
                        "train3d.py:228,261)")
    p.add_argument("--split", default="train", choices=["train", "all"])
    p.add_argument("--dataroot", default="../data")
    p.add_argument("--net", default="segtran",
                   choices=["segtran", "vnet", "unet"],
                   help="architecture: segtran (3d/25d), V-Net or "
                        "Modified3DUNet (reference train3d.py:80,637-649)")
    p.add_argument("--segtran", dest="segtran_type", default="3d",
                   choices=["3d", "25d"])
    p.add_argument("--bb", dest="backbone_type", default=None,
                   help="backbone override: i3d (3d) / eff-b* (25d) "
                        "(reference --bb, train3d.py:82)")
    p.add_argument("--into3", dest="inchan_to3_scheme", default=None,
                   choices=[None, "avgto3", "only1", "dup3", "bridgeconv",
                            "stemconv"],
                   help="multi-modality -> 3-channel bridge scheme "
                        "(reference --into3, segtran3d.py:117-139)")
    p.add_argument("--pos", dest="pos_code_type", default="lsinu",
                   choices=["lsinu", "rand", "sinu", "none", "bias"])
    p.add_argument("--nosqueeze", dest="use_squeezed_transformer",
                   action="store_false")
    p.add_argument("--multihead", dest="ablate_multihead",
                   action="store_true")
    p.add_argument("--infpn", dest="in_fpn_layers", default="34")
    p.add_argument("--outfpn", dest="out_fpn_layers", default="1234")
    p.add_argument("--attnclip", dest="attn_clip", type=float, default=500.0)
    p.add_argument("--posw", dest="pos_code_weight", type=float, default=1.0)
    p.add_argument("--posr", dest="pos_bias_radius", type=int, default=7)
    p.add_argument("--squeezeuseffn", dest="has_FFN_in_squeeze",
                   action="store_true")
    p.add_argument("--inbn", dest="in_fpn_use_bn", action="store_true")
    p.add_argument("--outdrop", dest="out_fpn_do_dropout",
                   action="store_true")
    p.add_argument("--nofeatup", dest="bb_feat_upsize", action="store_false")
    p.add_argument("--gbias", dest="use_global_bias", action="store_true")
    p.add_argument("--translayers", dest="num_translayers", type=int,
                   default=1)
    p.add_argument("--layercompress", dest="translayer_compress_ratios",
                   default=None)
    p.add_argument("--attractors", dest="num_attractors", type=int,
                   default=1024)
    p.add_argument("--modes", dest="num_modes", type=int, default=4)
    p.add_argument("--dropout", dest="dropout_prob", type=float, default=0.1)
    p.add_argument("--noqkbias", dest="qk_have_bias", action="store_false")
    p.add_argument("--attnconsist", dest="use_attn_consist_loss",
                   action="store_true",
                   help="attention-consistency loss: BCE between attention "
                        "scores and the mask consistency matrix (reference "
                        "train3d.py:115-117,426-449)")
    p.add_argument("--attnconsistweight", dest="attn_consist_w", type=float,
                   default=0.01)
    p.add_argument("--upd", dest="out_fpn_upsampleD_scheme", default=None,
                   choices=[None, "interp", "conv", "none"],
                   help="out-FPN depth-unpool scheme (reference train3d.py"
                        ":138; default: interp for 3d, conv for 25d)")
    p.add_argument("--dgroup", dest="d_groupsize", type=int, default=-1,
                   help="2.5D slice grouping: merge G consecutive depth "
                        "slices into channels (reference --dgroup, "
                        "train3d.py:162; -1 = 1)")
    p.add_argument("--dpool", dest="d_pool_k", type=int, default=-1,
                   help="depth pooling factor before the transformer "
                        "(reference --dpool, train3d.py:164; -1 = default 2)")
    p.add_argument("--maxiter", type=int, default=10000)
    p.add_argument("--saveiter", type=int, default=500)
    p.add_argument("--bs", dest="batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--decay", type=float, default=1e-4)
    p.add_argument("--gradclip", dest="grad_clip", type=float, default=0.1)
    p.add_argument("--lrwarmup", dest="lr_warmup_steps", type=int,
                   default=500)
    p.add_argument("--diceweight", dest="max_dice_w", type=float, default=0.5)
    p.add_argument("--randscale", type=float, default=0.1)
    p.add_argument("--noise", dest="noise_sigma", type=float, default=0.0)
    p.add_argument("--patchsize", dest="orig_patch_size", default=None,
                   help="crop size, e.g. 112,112,96")
    p.add_argument("--inputsize", dest="input_patch_size", default=None)
    p.add_argument("--scale", dest="input_scale", default=None,
                   help="per-axis input/crop scale, e.g. 0.5,0.5,1 "
                        "(reference --scale; alternative to --inputsize)")
    p.add_argument("--cp", dest="checkpoint_path", default=None)
    p.add_argument("--ckptdir", default="./model")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--ndevices", type=int, default=-1)
    p.add_argument("--tp", dest="tensor_parallel", type=int, default=1,
                   help="model-axis size for tensor-parallel weight "
                        "sharding (2D data x model mesh)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused", dest="use_fused_attention",
                   action="store_true",
                   help="Pallas flash attention forward+backward in the "
                        "squeezed transformer (wins for large token counts)")
    p.add_argument("--fusedepi", dest="use_fused_epilogue",
                   action="store_true",
                   help="Pallas fused output+LN+mode-pool epilogue "
                        "(eval legs; training steps keep the XLA path)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations (bigger batches in HBM)")
    p.add_argument("--norematblocks", dest="remat_blocks",
                   action="store_false", default=True,
                   help="disable per-MBConv-block rematerialization of the "
                        "2.5D EfficientNet backbone (on by default; no "
                        "effect on the 3D I3D backbone)")
    p.add_argument("--gradaccum", dest="grad_accum", type=int, default=1,
                   help="accumulate gradients over N microbatches per step "
                        "(exact full-batch mean; activation memory of one "
                        "microbatch; --bs must be divisible by N)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # cross-host init first (no-op on one host): reads JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID (README 'Multi-host training';
    # replaces reference dist.init_process_group, train2d.py:796-801)
    from ..parallel.multihost import init_multihost
    init_multihost(verbose=True)
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        raise ValueError(f"--gradaccum {args.grad_accum} must divide "
                         f"--bs {args.batch_size}")
    if args.grad_accum > 1:
        # see train2d.py: microbatches must stay divisible by the data axis
        _nd = args.ndevices if args.ndevices > 0 else len(jax.devices())
        _dp = _nd // max(args.tensor_parallel, 1)
        if (args.batch_size // args.grad_accum) % _dp:
            raise ValueError(
                f"microbatch size {args.batch_size // args.grad_accum} "
                f"(--bs {args.batch_size} / --gradaccum {args.grad_accum}) "
                f"must be divisible by the data-parallel device count {_dp}")
    task = dict(TASK_SETTINGS[args.task_name])
    for field, override in (("orig_patch_size", args.orig_patch_size),
                            ("input_patch_size", args.input_patch_size)):
        if override:
            task[field] = tuple(int(v) for v in str(override).split(","))
    if getattr(args, "input_scale", None) and not args.input_patch_size:
        # reference --scale (train3d.py:160,274-277): input size = scale *
        # crop size per axis
        sc = [float(v) for v in str(args.input_scale).split(",")]
        task["input_patch_size"] = tuple(
            int(s * L) for s, L in zip(sc, task["orig_patch_size"]))
    job = f"segtran{args.segtran_type}-{args.task_name}-" \
          f"{time.strftime('%m%d%H%M')}"
    ckpt_dir = os.path.join(args.ckptdir, job)
    logger = setup_logging(ckpt_dir)
    logger.info("args: %s", vars(args))

    if args.num_classes > 0:
        task["num_classes"] = args.num_classes
        task["bce_weight"] = (0.0,) + (1.0,) * (args.num_classes - 1)
        task["binarize"] = args.num_classes == 2   # reference train3d.py:264
    ds_name = args.ds_name or ("2019train" if args.task_name == "brats"
                               else "train")
    xyz_permute = (tuple(int(v) for v in args.xyz_permute.split(","))
                   if args.xyz_permute
                   else task.get("xyz_permute", None))
    ds_cls = {"brats": BratsSet, "atria": AtriaSet,
              "msd": MSDSet}[args.task_name]
    dataset = ds_cls(
        base_dir=os.path.join(args.dataroot, args.task_name, ds_name),
        split=args.split, mode="train",
        crop_size=tuple(task["orig_patch_size"]),
        binarize=task.get("binarize", False), seed=args.seed,
        chosen_modality=args.chosen_modality, xyz_permute=xyz_permute)
    logger.info("%d training volumes", len(dataset))
    if task["orig_in_channels"] == -1:
        # probe the modality count from the data (reference test3d.py:257-260)
        task["orig_in_channels"] = (1 if args.chosen_modality != -1
                                    else max(dataset.num_modalities, 1))
        logger.info("orig_in_channels probed: %d", task["orig_in_channels"])

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if getattr(args, "use_fused_attention", False) and args.dropout_prob > 0:
        # attention.py gates the fused path on deterministic-or-no-dropout;
        # with attention dropout the XLA path runs every training step
        logger.warning("--fused is inert during training with attention "
                       "dropout %.2f; pass --dropout 0 to engage the flash "
                       "kernels", args.dropout_prob)
    compress = tuple(
        float(x) for x in (args.translayer_compress_ratios or
                           ",".join(["1"] * (args.num_translayers + 1))
                           ).split(","))
    if getattr(args, "net", "segtran") == "vnet":
        from ..models.vnet import VNet
        cfg = None
        model = VNet(n_channels=task["orig_in_channels"],
                     num_classes=task["num_classes"],
                     normalization="groupnorm", dtype=dtype)
    elif getattr(args, "net", "segtran") == "unet":
        from ..models.unet3d import Modified3DUNet
        cfg = None
        model = Modified3DUNet(in_channels=task["orig_in_channels"],
                               num_classes=task["num_classes"], dtype=dtype)
    else:
        cfg_cls = (Segtran3dConfig if args.segtran_type == "3d"
                   else Segtran25dConfig)
        depth_kw = {}
        if getattr(args, "out_fpn_upsampleD_scheme", None):
            depth_kw["out_fpn_upsampleD_scheme"] = \
                args.out_fpn_upsampleD_scheme
        if getattr(args, "d_pool_k", -1) > 0:
            depth_kw["D_pool_K"] = args.d_pool_k
        if getattr(args, "d_groupsize", -1) > 0:
            depth_kw["D_groupsize"] = args.d_groupsize
        if getattr(args, "backbone_type", None):
            depth_kw["backbone_type"] = args.backbone_type
        if getattr(args, "inchan_to3_scheme", None):
            depth_kw["inchan_to3_scheme"] = args.inchan_to3_scheme
        cfg = cfg_cls(
            **depth_kw,
            num_classes=task["num_classes"],
            num_attractors=args.num_attractors,
            num_modes=args.num_modes,
            qk_have_bias=args.qk_have_bias,
            pos_code_type=getattr(args, "pos_code_type", "lsinu"),
            use_squeezed_transformer=getattr(
                args, "use_squeezed_transformer", True),
            ablate_multihead=getattr(args, "ablate_multihead", False),
            in_fpn_layers=tuple(
                int(c) for c in getattr(args, "in_fpn_layers", "34")),
            out_fpn_layers=tuple(
                int(c) for c in getattr(args, "out_fpn_layers", "1234")),
            attn_clip=getattr(args, "attn_clip", 500.0),
            pos_code_weight=getattr(args, "pos_code_weight", 1.0),
            pos_bias_radius=getattr(args, "pos_bias_radius", 7),
            has_FFN_in_squeeze=getattr(args, "has_FFN_in_squeeze", False),
            in_fpn_use_bn=getattr(args, "in_fpn_use_bn", False),
            out_fpn_do_dropout=getattr(args, "out_fpn_do_dropout", False),
            bb_feat_upsize=getattr(args, "bb_feat_upsize", True),
            use_global_bias=getattr(args, "use_global_bias", False),
            orig_in_channels=task["orig_in_channels"],
            hidden_dropout_prob=args.dropout_prob,
            attention_probs_dropout_prob=args.dropout_prob,
            use_attn_consist_loss=args.use_attn_consist_loss,
            remat=getattr(args, "remat", False),
            remat_blocks=getattr(args, "remat_blocks", False),
            use_fused_attention=getattr(args, "use_fused_attention", False),
            use_fused_epilogue=getattr(args, "use_fused_epilogue", False),
            dtype=dtype,
        ).derive(translayer_compress_ratios=compress)
        model = (Segtran3d(cfg) if args.segtran_type == "3d"
                 else Segtran25d(cfg))

    input_size = tuple(task["input_patch_size"])
    num_classes = task["num_classes"]
    binarize = task.get("binarize", False)
    if binarize:
        # reference train3d.py:514-515: binarized tasks use unweighted BCE
        bce_weight = None
    else:
        bce_weight = jnp.asarray(task["bce_weight"], jnp.float32)
        # rescale so the pos-weights sum to num_classes-1 (reference
        # train3d.py:516-518)
        bce_weight = bce_weight * (num_classes - 1) / jnp.sum(bce_weight)
        bce_weight = bce_weight.reshape((1, 1, 1, 1, num_classes))
    class_weights = jnp.ones(num_classes).at[0].set(0.0)
    class_weights = class_weights / class_weights.sum()
    dice_w = args.max_dice_w
    randscale = args.randscale
    noise_sigma = args.noise_sigma
    is_brats = args.task_name == "brats"

    def loss_fn(logits, mask):
        if logits.shape[1:4] != mask.shape[1:4]:
            logits = resize_linear(logits, mask.shape[1:4])
        probs = jax.nn.sigmoid(logits)
        ce = weighted_bce_with_logits(logits, mask, bce_weight)
        dice_total = 0.0
        metrics = {}
        for cls in range(1, num_classes):
            d = dice_loss_indiv(probs[..., cls], mask[..., cls])
            metrics[f"dice_loss_cls{cls}"] = d
            dice_total = dice_total + d * class_weights[cls]
        loss = (1 - dice_w) * ce + dice_w * dice_total
        metrics.update(loss=loss, ce_loss=ce, dice_loss=dice_total)
        return loss, metrics

    warmup_ratio = min(args.lr_warmup_steps, args.maxiter // 2) / args.maxiter
    tx = build_optimizer(lr=args.lr, decay=args.decay, t_total=args.maxiter,
                         warmup_ratio=warmup_ratio, grad_clip=args.grad_clip)
    aux_loss_fn = None
    if args.use_attn_consist_loss and getattr(args, "net",
                                              "segtran") != "segtran":
        logger.warning("--attnconsist needs transformer attention scores; "
                       "ignored for --net %s", args.net)
        args.use_attn_consist_loss = False
    if args.use_attn_consist_loss:
        from ..train.da import (attention_consistency_loss_3d,
                                collect_attn_scores)
        depth_first = args.segtran_type == "3d"   # 25d rasters (h,w,d)
        ac_w = args.attn_consist_w

        def aux_loss_fn(mstate, mask):
            scores = collect_attn_scores(mstate)
            if not scores:
                raise ValueError(
                    "no attention scores collected -- remat drops sown "
                    "intermediates; use --attnconsist without --remat")
            feat = mstate["intermediates"]["in_fpn_feat"][0]
            ac = attention_consistency_loss_3d(
                scores, mask, tuple(feat.shape[1:4]),
                depth_first=depth_first)
            return ac_w * ac, {"attn_consist_loss": ac}

    base_step = make_train_step(model, tx, loss_fn, aux_loss_fn=aux_loss_fn,
                                grad_accum=max(1, int(getattr(
                                    args, "grad_accum", 1))))

    def step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step + 31)
        k1, k2, k3 = jax.random.split(rng, 3)
        image = batch["image"]
        # per-sample rot/flip (reference compose, train3d.py:573-578)
        keys = jax.random.split(k1, image.shape[0])
        image, label_rf = jax.vmap(random_rot_flip_3d)(
            keys, image, batch["label"])
        if is_brats:
            mask = brats_map_label(label_rf, binarize)
        else:
            mask = index_to_onehot(label_rf, num_classes)
        if randscale > 0:
            image, mask = random_resized_crop_3d(k2, image, mask, randscale)
        if noise_sigma > 0:
            image = random_noise_3d(k3, image, noise_sigma)
        if image.shape[1:4] != input_size:
            image = resize_linear(image, input_size)
        return base_step(state, {"image": image, "mask": mask})

    example = jnp.zeros((1,) + input_size + (task["orig_in_channels"],),
                        jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(args.seed)}, example)
    batch_stats = rest.get("batch_stats", {})
    if args.checkpoint_path:
        payload = load_checkpoint(args.checkpoint_path, cfg)
        params = merge_params(params, payload.get("params", {}))
        if payload.get("batch_stats"):
            batch_stats = merge_params(batch_stats, payload["batch_stats"])
        logger.info("loaded checkpoint %s", args.checkpoint_path)
    state = create_train_state(params, batch_stats, tx,
                               jax.random.PRNGKey(args.seed + 1))

    n_dev = args.ndevices if args.ndevices > 0 else len(jax.devices())
    tp = max(args.tensor_parallel, 1)
    if tp > 1:
        if n_dev % tp:
            raise ValueError(f"--tp {tp} must divide device count {n_dev}")
        from ..parallel.tensor_parallel import (shard_state_to_mesh,
                                                shard_train_step_2d)
        mesh = make_mesh(n_dev, axes=("data", "model"),
                         shape=(n_dev // tp, tp))
        state, state_spec = shard_state_to_mesh(state, mesh)
        sharded_step = shard_train_step_2d(step, mesh, state_spec,
                                           donate_state=True)
    else:
        mesh = make_mesh(n_dev)
        sharded_step = shard_train_step(step, mesh, donate_state=True)
        state = replicate_to_mesh(state, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sharding = NamedSharding(mesh, P("data"))
    meters = AverageMeters()
    iter_num, epoch, t0 = 0, 0, time.time()
    logger.info("compiling the train step (first step; cold compiles of "
                "large recipes can take minutes -- warm reruns of unchanged "
                "shapes hit the persistent .jax_cache)...")
    while iter_num < args.maxiter:
        it = batch_iterator(dataset, args.batch_size, epoch, seed=args.seed,
                            keys=("image", "label"))
        for batch in prefetch_to_device(it, sharding=batch_sharding):
            state, metrics = sharded_step(state, batch)
            iter_num += 1
            for k, v in metrics.items():
                meters.update(k, float(v))
            if iter_num == 1:
                logger.info("first step done in %.1fs (compile + run)",
                            time.time() - t0)
            if iter_num % 50 == 0:
                logger.info("iter %d (%.2f it/s): %s", iter_num,
                            iter_num / (time.time() - t0),
                            meters.disp_str(("loss", "ce_loss", "dice_loss")))
                meters.reset_disp()
            if iter_num % args.saveiter == 0 or iter_num >= args.maxiter:
                host = jax.device_get(state)
                # async: serialization overlaps the next train steps
                save_checkpoint(ckpt_dir, iter_num, host.params,
                                host.batch_stats, cfg=cfg, async_save=True)
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

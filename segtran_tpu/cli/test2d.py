"""2D evaluation driver: checkpoint sweeps + batched sliding-window inference
+ Dice/vCDR metrics + mask saving.

Replaces the reference's code/test2d.py + test_util2d.py: the per-patch Python
loop becomes one jitted gather->model->scatter graph (infer/sliding.py), the
iteration sweep ("7000,8000" or "40-1600,40", reference test2d.py:753-769) is
kept, per-class Dice matches calc_batch_metric (test_util2d.py:241-265), and
predictions can be saved as REFUGE-format grayscale masks.
"""
from __future__ import annotations

import argparse
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import TASK_SETTINGS
from ..data.datasets2d import SegCrop, SegWhole
from ..data.labelmaps import (fundus_map_mask, fundus_inv_map_mask,
                              polyp_map_mask, polyp_inv_map_mask,
                              harden_segmap, index_to_onehot)
from ..data.pipeline import batch_iterator
from ..infer.metrics import batch_dice_per_class
from ..infer.sliding import sliding_window_2d
from ..ops.losses import calc_vcdr_eval
from ..train.checkpoint import load_checkpoint, merge_params
from ..nn.init import init_with_reference_schemes
from ..utils import setup_logging


def parse_iters(spec: str):
    """"7000,8000" or "40-1600,40" (reference test2d.py:753-769)."""
    if "-" in spec:
        rng, step = spec.split(",")
        lo, hi = rng.split("-")
        return list(range(int(lo), int(hi) + 1, int(step)))
    return [int(x) for x in spec.split(",")]


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", dest="task_name", default="fundus")
    p.add_argument("--ds", dest="ds_name", default="valid")
    p.add_argument("--split", default="all")
    p.add_argument("--dataroot", default="../data")
    p.add_argument("--net", default="segtran")
    p.add_argument("--bb", dest="backbone_type", default="eff-b4")
    p.add_argument("--translayers", dest="num_translayers", type=int,
                   default=3)
    p.add_argument("--layercompress", dest="translayer_compress_ratios",
                   default=None)
    p.add_argument("--attractors", dest="num_attractors", type=int,
                   default=256)
    p.add_argument("--noqkbias", dest="qk_have_bias", action="store_false")
    p.add_argument("--nosqueeze", dest="use_squeezed_transformer",
                   action="store_false")
    p.add_argument("--pos", dest="pos_code_type", default="lsinu",
                   choices=["lsinu", "rand", "sinu", "none", "bias"])
    p.add_argument("--mince", dest="use_mince_transformer",
                   action="store_true")
    p.add_argument("--mincescales", dest="mince_scales", default=None)
    p.add_argument("--minceprops", dest="mince_channel_props", default=None)
    p.add_argument("--infpn", dest="in_fpn_layers", default="34")
    p.add_argument("--outfpn", dest="out_fpn_layers", default="1234")
    p.add_argument("--cpdir", required=True,
                   help="checkpoint dir containing iter_N")
    p.add_argument("--iters", default=None,
                   help='e.g. "7000,8000" or "40-1600,40"')
    p.add_argument("--bs", dest="batch_size", type=int, default=8)
    p.add_argument("--origsize", dest="orig_input_size", default=None)
    p.add_argument("--patchsize", dest="patch_size", default=None)
    p.add_argument("--stats", dest="stats_json", default=None)
    p.add_argument("--gray", dest="gray_alpha", type=float, default=0.5,
                   help="grayscale blend used at training time "
                        "(must match train2d --gray)")
    p.add_argument("--saveprobs", action="store_true")
    p.add_argument("--outorigsize", dest="out_origsize", action="store_true",
                   help="save masks at the original uncropped frame size "
                        "(REFUGE submission format)")
    p.add_argument("--outdir", default=None, help="save predicted masks here")
    p.add_argument("--vcdr", dest="do_vcdr", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--scanblocks", dest="scan_blocks", action="store_true",
                   help="evaluate with the scan-over-MBConv-repeats backbone"
                        " (per-block checkpoints adapt on load)")
    p.add_argument("--fused", dest="use_fused_attention",
                   action="store_true")
    p.add_argument("--fusedepi", dest="use_fused_epilogue",
                   action="store_true",
                   help="Pallas fused output+LN+mode-pool epilogue")
    p.add_argument("--polyformer", dest="polyformer_mode", default=None,
                   choices=[None, "source", "target"])
    p.add_argument("--testinterp", dest="test_interp", default=None,
                   help="null-model sanity check: predict = GT downsampled "
                        "to this size then upsampled (reference "
                        "test_util2d.py:60-64), e.g. 144,144")
    p.add_argument("--exclusive", dest="use_exclusive_masks",
                   action="store_true")
    p.add_argument("--removefrag", dest="do_remove_frag",
                   action="store_true",
                   help="keep only the largest connected foreground "
                        "components in each prediction (reference "
                        "test2d.py:136, test_util2d.py:267-289)")
    p.add_argument("--savefeat", dest="save_features_img_count", type=int,
                   default=0,
                   help="dump per-pixel (feature, label) pairs of the first "
                        "N images for t-SNE (reference test2d.py:161, "
                        "test_util2d.py:78-88); saved as pixel_features.npz")
    # architecture flags: must match the training run so checkpoints load
    # (reference test2d.py argparser)
    p.add_argument("--modes", dest="num_modes", type=int, default=-1)
    p.add_argument("--multihead", dest="ablate_multihead",
                   action="store_true")
    p.add_argument("--attnclip", dest="attn_clip", type=float, default=500.0)
    p.add_argument("--gbias", dest="use_global_bias", action="store_true")
    p.add_argument("--inbn", dest="in_fpn_use_bn", action="store_true")
    p.add_argument("--nofeatup", dest="bb_feat_upsize", action="store_false")
    p.add_argument("--posw", dest="pos_code_weight", type=float, default=1.0)
    p.add_argument("--posr", dest="pos_bias_radius", type=int, default=7)
    p.add_argument("--squeezeuseffn", dest="has_FFN_in_squeeze",
                   action="store_true")
    p.add_argument("--verbose", action="store_true",
                   help="log per-image dice scores (reference "
                        "test_util2d.py:72-73)")
    p.add_argument("--flop", dest="do_flop_count", action="store_true",
                   help="print param count + per-image forward GFLOPs "
                        "(reference --flop, test2d.py:623-631)")
    p.add_argument("--vis", dest="vis_mode", default=None,
                   choices=[None, "rf"],
                   help="receptive-field visualization: per-layer gradient "
                        "ERF maps saved as rf_<layer>.png/.npz (reference "
                        "test2d.py:144-148, internal_util.py:21-58)")
    p.add_argument("--vislayers", dest="vis_layers", default=None,
                   help="comma-separated feature-layer indices (default all;"
                        " reference --vislayers)")
    p.add_argument("--robust", dest="eval_robustness", action="store_true",
                   help="feature-robustness evaluation under perturbations "
                        "(reference --robust, internal_util.py:197-343)")
    p.add_argument("--robustsamples", dest="robust_sample_num", type=int,
                   default=8)
    p.add_argument("--robustaug", dest="robust_aug_types", default=None,
                   help="restrict --robust to these perturbations "
                        "(comma-separated; brightness/contrast/saturation/"
                        "resize_down/resize_up/noise; reference --robustaug,"
                        " test2d.py:154)")
    p.add_argument("--robustaugdeg", dest="robust_aug_degrees",
                   default="0.5,1.5",
                   help="jitter factor range for --robust (reference "
                        "--robustaugdeg, test2d.py:157 default 0.5,1.5)")
    p.add_argument("--robustcp", dest="robust_ref_cp_path", default=None,
                   help="second checkpoint (iter_N dir) providing the CLEAN "
                        "reference features for --robust (reference "
                        "--robustcp, test2d.py:159,634-638)")
    p.add_argument("--nomask", dest="has_mask", action="store_false",
                   help="predict-only mode for datasets without ground truth "
                        "(reference has_mask=False datasets, e.g. valid2)")
    return p


def build_model(args, task):
    """Reuse the training factory so every --net evaluates identically
    (defaults filled for flags the eval CLI does not expose)."""
    from .train2d import build_model_and_config
    import argparse as _ap
    defaults = dict(num_modes=-1, dropout_prob=0.0,
                    use_squeezed_transformer=True, ablate_multihead=False,
                    pos_code_type="lsinu", in_fpn_layers="34",
                    out_fpn_layers="1234", polyformer_mode=None,
                    bn_opt_scheme=None, use_attn_consist_loss=False)
    merged = _ap.Namespace(**{**defaults, **vars(args)})
    return build_model_and_config(merged, task)


# jitted forwards memoized across the checkpoint sweep: a fresh jax.jit
# per iter_N would retrace/recompile every checkpoint. Keyed by the model
# identity + preproc constants (stable within one CLI run).
_FWD_CACHE: dict = {}


def _jitted_forwards(model, mean, std, gray_alpha):
    key = (id(model), tuple(mean), tuple(std), float(gray_alpha))
    if key not in _FWD_CACHE:
        mean_a = jnp.asarray(mean)
        std_a = jnp.asarray(std)
        gray_w = jnp.asarray([0.299, 0.587, 0.114])

        def _preproc(image):
            gray = jnp.tensordot(image, gray_w,
                                 axes=[[-1], [0]])[..., None]
            x = (1 - gray_alpha) * image + gray_alpha * gray
            return (x - mean_a) / std_a

        # variables are a jit ARGUMENT, not a closure: closed-over device
        # arrays become HLO constants, and at eff-b4 scale the
        # constant-laden program exceeds the axon relay's remote-compile
        # request cap (HTTP 413)
        @jax.jit
        def _model_fn(variables, image):
            return model.apply(variables, _preproc(image), train=False)

        from .train2d import _da_feature

        @jax.jit
        def _feat_fn(variables, image):
            """The reference's net.feature_maps[-1] on one direct forward
            (test_util2d.py:78-88)."""
            _, mstate = model.apply(variables, _preproc(image),
                                    train=False, mutable=["intermediates"])
            return _da_feature(mstate)

        _FWD_CACHE[key] = (_model_fn, _feat_fn)
    return _FWD_CACHE[key]


def evaluate_checkpoint(model, variables, dataset, task, args, logger,
                        mean, std):
    num_classes = task["num_classes"]
    orig = tuple(task["orig_input_size"])
    patch = tuple(task["patch_size"])
    _model_fn, _feat_fn = _jitted_forwards(model, mean, std,
                                           args.gray_alpha)

    def model_fn(image):
        return _model_fn(variables, image)

    feat_budget = getattr(args, "save_features_img_count", 0)
    if feat_budget > 0:
        def feat_fn(image):
            return _feat_fn(variables, image)

    all_dice = []
    all_vcdr_err = []
    saved = []
    feats_acc, labels_acc = [], []
    for batch in batch_iterator(dataset, args.batch_size, epoch=0,
                                shuffle=False, drop_last=False,
                                keys=("image", "mask", "index", "crop_pos",
                                      "unscaled_size", "uncropped_size")):
        img = jnp.asarray(batch["image"])
        if getattr(args, "test_interp", None):
            # null-model interpolation floor (reference test_util2d.py:60-64)
            ti = tuple(int(v) for v in str(args.test_interp).split(","))
            ti = ti * 2 if len(ti) == 1 else ti
            gt_now = (fundus_map_mask(jnp.asarray(batch["mask"]))
                      if args.task_name == "fundus" else
                      polyp_map_mask(jnp.asarray(batch["mask"]))
                      if args.task_name == "polyp" else
                      index_to_onehot(jnp.asarray(batch["mask"][..., 0]),
                                      num_classes))
            small = jax.image.resize(
                gt_now, gt_now.shape[:1] + ti + gt_now.shape[3:], "nearest")
            from ..ops.resize import resize_linear
            probs = resize_linear(small, gt_now.shape[1:3])
        else:
            probs = sliding_window_2d(model_fn, img, orig, patch,
                                      num_classes=num_classes)
        if args.task_name == "fundus":
            gt = fundus_map_mask(jnp.asarray(batch["mask"]),
                                 exclusive=getattr(args,
                                                   "use_exclusive_masks",
                                                   False))
        elif args.task_name == "polyp":
            gt = polyp_map_mask(jnp.asarray(batch["mask"]))
        else:
            gt = index_to_onehot(jnp.asarray(batch["mask"][..., 0]),
                                 num_classes)
        hard = harden_segmap(probs)
        if getattr(args, "do_remove_frag", False):
            # keep only the largest connected foreground components
            # (reference test2d.py:654-656, test_util2d.py:267-289)
            from ..tools.postproc import remove_fragmentary_segs
            hard_np = np.array(hard)   # writable copy
            for i in range(hard_np.shape[0]):
                fg = hard_np[i, :, :, 1:].any(-1).astype(np.uint8)
                kept = (remove_fragmentary_segs(fg, keep_top=2) > 0)
                hard_np[i, :, :, 1:] = (hard_np[i, :, :, 1:]
                                        * kept[..., None])
                hard_np[i, :, :, 0] = 1 - hard_np[i, :, :, 1:].max(-1)
            hard = jnp.asarray(hard_np)
        if feat_budget > 0 and len(feats_acc) < feat_budget:
            from ..ops.resize import resize_linear
            small = resize_linear(img, patch)
            feats = np.asarray(feat_fn(small))            # [B, h2, w2, C]
            gt_ex = (fundus_map_mask(jnp.asarray(batch["mask"]),
                                     exclusive=True)
                     if args.task_name == "fundus" else gt)
            lab = resize_linear(gt_ex.astype(jnp.float32),
                                feats.shape[1:3])
            lab = np.asarray((lab >= 0.5).argmax(-1))     # [B, h2, w2]
            for i in range(feats.shape[0]):
                if len(feats_acc) >= feat_budget:
                    break
                feats_acc.append(feats[i])
                labels_acc.append(lab[i])
        if getattr(args, "has_mask", True):
            dice = batch_dice_per_class(hard.astype(jnp.float32), gt,
                                        num_classes)
            all_dice.append(np.asarray(dice))
            if getattr(args, "verbose", False):
                # per-image scores (reference test_util2d.py:72-73)
                for i, idx in enumerate(np.asarray(batch["index"])):
                    name = os.path.basename(dataset.image_list[int(idx)])
                    logger.info("%s: dice %s", name,
                                np.round(all_dice[-1][i], 4))
        if args.do_vcdr and num_classes >= 3:
            # per-image (unbatched-branch) vCDR, as the reference eval
            # computes it (calc_batch_metric -> utils/losses.py:99-127)
            verr = jnp.abs(calc_vcdr_eval(gt) -
                           calc_vcdr_eval(hard.astype(jnp.float32)))
            all_vcdr_err.append(np.asarray(verr))
        if args.outdir:
            os.makedirs(args.outdir, exist_ok=True)
            from PIL import Image
            inv = (fundus_inv_map_mask if args.task_name == "fundus"
                   else polyp_inv_map_mask)
            raw = np.asarray(inv(hard))
            for i, idx in enumerate(np.asarray(batch["index"])):
                name = os.path.basename(dataset.image_list[int(idx)])
                out_path = os.path.join(args.outdir, name)
                pred = raw[i]
                if args.out_origsize:
                    # reassemble the full uncropped frame: resize the crop
                    # prediction back to its pre-resize size, paste at
                    # crop_pos on a background canvas (reference
                    # test_util2d.py:121-132)
                    h0, w0 = (int(x) for x in batch["unscaled_size"][i])
                    pred = np.asarray(Image.fromarray(pred).resize(
                        (w0, h0), Image.NEAREST))
                    unc = np.asarray(batch["uncropped_size"][i]).reshape(-1)
                    if unc.size == 2 and int(unc[0]) > 0:
                        cx, cy = (int(x) for x in batch["crop_pos"][i])
                        bg = 255 if args.task_name == "fundus" else 0
                        canvas = np.full((int(unc[0]), int(unc[1])), bg,
                                         np.uint8)
                        canvas[cx:cx + h0, cy:cy + w0] = pred
                        pred = canvas
                Image.fromarray(pred).save(out_path)
                saved.append(out_path)
                if args.saveprobs:
                    np.save(out_path + ".probs.npy",
                            np.asarray(probs[i], np.float16))
    if feats_acc:
        from ..tools.analysis import dump_pixel_features
        fdir = args.outdir or args.cpdir
        os.makedirs(fdir, exist_ok=True)
        fpath = os.path.join(fdir, "pixel_features.npz")
        dump_pixel_features(np.stack(feats_acc), np.stack(labels_acc), fpath)
        logger.info("saved pixel features of %d images -> %s",
                    len(feats_acc), fpath)
    if not all_dice:
        logger.info("predict-only mode: no ground truth, no Dice")
        if args.outdir and saved:
            zpath = os.path.join(args.outdir, "pred.zip")
            with zipfile.ZipFile(zpath, "w") as z:
                for pth in saved:
                    z.write(pth, os.path.basename(pth))
            logger.info("zipped %d masks -> %s", len(saved), zpath)
        return np.zeros(num_classes - 1)
    dice = np.concatenate(all_dice, 0)
    cls_dice = dice.mean(0)
    for c, d in enumerate(cls_dice):
        logger.info("class %d dice: %.4f", c + 1, d)
    logger.info("avg dice: %.4f", cls_dice.mean())
    if all_vcdr_err:
        vcdr_err = float(np.concatenate(all_vcdr_err).mean())
        logger.info("vCDR error: %.4f", vcdr_err)
        # match the reference metric layout: [dice_cls1..dice_clsN, vcdr_err]
        # (reference test_util2d.py:28, allcls_metric_sum has the extra slot)
        cls_dice = np.concatenate([cls_dice, [vcdr_err]])
    if args.outdir and saved:
        zpath = os.path.join(args.outdir, "pred.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for pth in saved:
                z.write(pth, os.path.basename(pth))
        logger.info("zipped %d masks -> %s", len(saved), zpath)
    return cls_dice


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    task = dict(TASK_SETTINGS[args.task_name])
    for field, override in (("orig_input_size", args.orig_input_size),
                            ("patch_size", args.patch_size)):
        if override:
            vals = tuple(int(v) for v in str(override).split(","))
            task[field] = vals * 2 if len(vals) == 1 else vals
    logger = setup_logging(args.cpdir, "eval_log.txt")
    from ..infer.metrics import log_metric_stack
    log_metric_stack(logger)

    ds_cls = {"SegCrop": SegCrop, "SegWhole": SegWhole}[task["ds_class"]]
    # --nomask wins; otherwise the per-dataset preset decides (e.g. REFUGE
    # valid2/test2 and the gamma sets ship without annotations)
    has_mask = getattr(args, "has_mask", True) and \
        task.get("has_mask", {}).get(args.ds_name, True)
    dataset = ds_cls(
        base_dir=os.path.join(args.dataroot, args.task_name, args.ds_name),
        split=args.split, mask_num_classes=task["num_classes"],
        has_mask=has_mask,
        uncropped_size=task.get("uncropped_size", {}).get(args.ds_name, -1),
        binarize=task.get("binarize", False),
        out_size=task["orig_input_size"])
    logger.info("%d eval samples", len(dataset))

    from .train2d import load_stats
    mean, std = load_stats(args, args.ds_name)

    # Validate checkpoint paths BEFORE model init: a missing iter should fail
    # in milliseconds, not after the multi-minute init/compile.
    iters = parse_iters(args.iters) if args.iters else [None]
    missing = [it for it in iters if it is not None and
               not os.path.isdir(os.path.join(args.cpdir, f"iter_{it}"))]
    if missing:
        raise FileNotFoundError(
            f"checkpoint dir(s) not found under {args.cpdir}: "
            + ", ".join(f"iter_{it}" for it in missing))

    model, cfg = build_model(args, task)
    example = jnp.zeros((1,) + tuple(task["patch_size"]) + (3,), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, example)
    if getattr(args, "do_flop_count", False):
        # params + per-image forward FLOPs via XLA cost analysis
        # (reference --flop, fvcore FlopCountAnalysis, test2d.py:623-631)
        from ..tools.flops import count_params, estimate_flops
        fl = estimate_flops(
            jax.jit(lambda v, x: model.apply(v, x, train=False)),
            {"params": params, **rest}, example)
        logger.info("params: %.2fM  forward: %.2f GFLOPs/img "
                    "(%.2f GB accessed)", count_params(params) / 1e6,
                    fl.get("flops", 0.0) / 1e9,
                    fl.get("bytes", 0.0) / 1e9)
    results = {}
    for it in iters:
        if it is not None:
            from ..nn.backbones.efficientnet import maybe_adapt_scan_layout
            path = os.path.join(args.cpdir, f"iter_{it}")
            payload = load_checkpoint(path, cfg)
            want_scan = getattr(cfg, "scan_blocks", False)
            params_i = merge_params(params, maybe_adapt_scan_layout(
                payload.get("params", {}), args.backbone_type, want_scan))
            bstats = merge_params(rest.get("batch_stats", {}),
                                  maybe_adapt_scan_layout(
                                      payload.get("batch_stats", {}),
                                      args.backbone_type, want_scan))
            logger.info("=== iter %d ===", it)
        else:
            params_i, bstats = params, rest.get("batch_stats", {})
        variables = {"params": params_i}
        if bstats:
            variables["batch_stats"] = bstats
        # one upload: checkpoint leaves are host numpy (merge_params), and a
        # numpy jit ARGUMENT would re-transfer per sliding-window chunk
        variables = jax.device_put(variables)
        if getattr(args, "vis_mode", None) == "rf":
            from PIL import Image
            from ..tools.analysis import layer_receptive_fields
            sel = ([int(v) for v in str(args.vis_layers).split(",")]
                   if args.vis_layers else None)
            maps = layer_receptive_fields(
                model, variables, tuple(task["patch_size"]) + (3,), sel)
            vis_dir = args.outdir or args.cpdir
            os.makedirs(vis_dir, exist_ok=True)
            np.savez_compressed(os.path.join(vis_dir, "rf_maps.npz"), **maps)
            for name, m in maps.items():
                mm = m / (m.max() + 1e-12)
                Image.fromarray((mm * 255).astype(np.uint8)).save(
                    os.path.join(vis_dir, f"rf_{name}.png"))
                logger.info("rf[%s]: %s, mass within center quarter %.3f",
                            name, m.shape, float(
                                m[m.shape[0] // 4:-m.shape[0] // 4 or None,
                                  m.shape[1] // 4:-m.shape[1] // 4 or None]
                                .sum() / (m.sum() + 1e-12)))
            results[it] = maps
            continue
        if args.eval_robustness:
            from ..tools.robustness import eval_robustness
            n = min(args.robust_sample_num, len(dataset))
            imgs = jnp.stack([jnp.asarray(dataset[i]["image"])
                              for i in range(n)])
            imgs = jax.image.resize(
                imgs, (n,) + tuple(task["patch_size"]) + (imgs.shape[-1],),
                "linear")
            ref_vars = None
            if getattr(args, "robust_ref_cp_path", None):
                from ..nn.backbones.efficientnet import \
                    maybe_adapt_scan_layout
                ref_payload = load_checkpoint(args.robust_ref_cp_path, cfg)
                ref_params = merge_params(params, maybe_adapt_scan_layout(
                    ref_payload.get("params", {}), args.backbone_type,
                    getattr(cfg, "scan_blocks", False)))
                ref_vars = {"params": ref_params}
                ref_b = merge_params(rest.get("batch_stats", {}),
                                     maybe_adapt_scan_layout(
                                         ref_payload.get("batch_stats", {}),
                                         args.backbone_type,
                                         getattr(cfg, "scan_blocks", False)))
                if ref_b:
                    ref_vars["batch_stats"] = ref_b
            kw = {}
            if getattr(args, "robust_aug_types", None):
                kw["perturbations"] = [
                    t for t in str(args.robust_aug_types).split(",") if t]
            deg = tuple(float(v) for v in
                        str(getattr(args, "robust_aug_degrees", "0.5,1.5")
                            ).split(","))
            rob = eval_robustness(model, variables, imgs,
                                  degrees=deg * 2 if len(deg) == 1 else deg,
                                  ref_variables=ref_vars, **kw)
            for pert, vals in rob.items():
                logger.info("robustness[%s]: output_pearson=%.4f", pert,
                            vals["output_pearson"])
                for k, v in sorted(vals.items()):
                    if k != "output_pearson" and not k.startswith(("lr_",
                                                                   "std/")):
                        logger.info("  %s: %.4f", k, v)
            results[it] = rob
            continue
        results[it] = evaluate_checkpoint(model, variables, dataset, task,
                                          args, logger, mean, std)
    return results


if __name__ == "__main__":
    main()

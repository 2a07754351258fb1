"""Import a reference .pth checkpoint into this framework's orbax format.

The reference saves {'iter_num', 'model': state_dict, 'args': vars(args)}
(reference train2d.py:640-648). This CLI reads the .pth (torch, CPU), derives
the model config from the embedded args, converts the state_dict with the
generic torch->flax mapper, validates it against a freshly-initialized model,
and writes an orbax checkpoint + config sidecar that cli/test2d.py /
cli/test3d.py consume. This is the path to Dice parity with the released
REFUGE / BraTS weights.

Usage:
  python -m segtran_tpu.convert.cli --pth iter_5000.pth --out ./converted \
      [--model segtran2d|segtran3d|segtran25d|unet2d]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

# zoo nets with dedicated key adapters + parity tests (reference train2d/
# train3d save their plain state_dicts like any other net's)
_ZOO_KINDS = ("transunet", "deeplabv3plus", "deeplabv3", "setr", "attunet",
              "r2attunet", "dunet", "nestedunet", "unet3plus", "vnet",
              "unet3d", "unet_smp")


def config_from_pth_args(pth_args: dict, model_kind: str):
    from ..configs import (Segtran2dConfig, Segtran3dConfig, Segtran25dConfig)
    get = pth_args.get
    common = dict(
        num_classes=get("num_classes", 2),
        num_attractors=get("num_attractors", 256),
        num_modes=get("num_modes", 4) if get("num_modes", 4) not in (-1, None)
        else 4,
        qk_have_bias=get("qk_have_bias", True),
        use_squeezed_transformer=get("use_squeezed_transformer", True),
        pos_code_type=get("pos_code_type", "lsinu"),
        ablate_multihead=get("ablate_multihead", False),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    compress = tuple(float(x) for x in get(
        "translayer_compress_ratios",
        [1.0] * (get("num_translayers", 1) + 1)))
    in_layers = tuple(int(c) for c in str(get("in_fpn_layers", "34")))
    out_layers = tuple(int(c) for c in str(get("out_fpn_layers", "1234")))
    if model_kind == "segtran2d":
        cfg = Segtran2dConfig(
            backbone_type=get("backbone_type", "eff-b4"),
            in_fpn_layers=in_layers, out_fpn_layers=out_layers, **common)
    elif model_kind == "segtran3d":
        cfg = Segtran3dConfig(
            orig_in_channels=get("orig_in_channels", 4),
            inchan_to3_scheme=get("inchan_to3_scheme", "bridgeconv"),
            D_pool_K=get("D_pool_K", 2),
            out_fpn_upsampleD_scheme=get("out_fpn_upsampleD_scheme",
                                         "interp"),
            in_fpn_layers=in_layers, out_fpn_layers=out_layers, **common)
    elif model_kind == "segtran25d":
        cfg = Segtran25dConfig(
            backbone_type=get("backbone_type", "eff-b3"),
            orig_in_channels=get("orig_in_channels", 4),
            inchan_to3_scheme=get("inchan_to3_scheme", "stemconv"),
            D_pool_K=get("D_pool_K", 2),
            out_fpn_upsampleD_scheme=get("out_fpn_upsampleD_scheme", "conv"),
            in_fpn_layers=in_layers, out_fpn_layers=out_layers, **common)
    else:
        return None
    return cfg.derive(translayer_compress_ratios=compress)


def example_input_for(model_kind: str, cfg, pth_args: dict):
    if model_kind == "segtran2d" or model_kind == "unet2d":
        ps = pth_args.get("patch_size", (288, 288))
        if isinstance(ps, int):
            ps = (ps, ps)
        return jnp.zeros((1,) + tuple(ps) + (3,), jnp.float32)
    ps = pth_args.get("input_patch_size", (112, 112, 96))
    c = pth_args.get("orig_in_channels", 4)
    return jnp.zeros((1,) + tuple(ps) + (c,), jnp.float32)


def convert_pth(pth_path: str, out_dir: str, model_kind: str = "segtran2d",
                strict: bool = False):
    import torch
    from .torch_import import convert_state_dict, assign_converted
    from ..nn.init import init_with_reference_schemes
    from ..train.checkpoint import save_checkpoint

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    pth_args = ckpt.get("args", {})
    iter_num = ckpt.get("iter_num", 0)
    sd_np = {k: v.numpy() for k, v in sd.items()
             if hasattr(v, "numpy")}

    if model_kind in _ZOO_KINDS:
        return _convert_zoo_pth(model_kind, sd_np, pth_args, iter_num,
                                out_dir, strict)
    # discard DA heads the eval model doesn't own (reference test2d.py:671-674)
    sd_np = {k: v for k, v in sd_np.items()
             if not k.startswith(("discriminator.", "recon."))}
    # legacy key rename (reference test2d.py:506-510)
    sd_np = {k.replace("out_bridgeconv", "out_fpn_bridgeconv"): v
             for k, v in sd_np.items()}

    # effv2 backbones come from timm whose key layout differs from our flax
    # scopes (reference segtran2d.py:106-117); pre-rename those keys
    if str(pth_args.get("backbone_type", "")).startswith("effv2"):
        from .torch_import import rename_timm_effv2_key
        renamed = {}
        for k, v in sd_np.items():
            if k.startswith("backbone."):
                nk = rename_timm_effv2_key(k[len("backbone."):])
                if nk is None:
                    continue
                k = "backbone." + nk
            renamed[k] = v
        sd_np = renamed

    tie_shared = pth_args.get("tie_qk_scheme", "shared") == "shared"
    # The no-out-FPN 2x upsampling head (reference segtran2d.py:205-208) is a
    # ConvTranspose with a >1 spatial kernel; every other out_conv is 1x1.
    transposed = frozenset(
        k[:-len(".weight")] for k, v in sd_np.items()
        if k.endswith("out_conv.weight") and v.ndim in (4, 5)
        and any(s > 1 for s in v.shape[2:]))
    conv_params, conv_stats = convert_state_dict(
        sd_np, tie_qk_shared=tie_shared, transposed_conv_paths=transposed)

    cfg = config_from_pth_args(pth_args, model_kind)
    if model_kind == "segtran2d":
        from ..models import Segtran2d
        model = Segtran2d(cfg)
    elif model_kind == "segtran3d":
        from ..models.segtran3d import Segtran3d
        model = Segtran3d(cfg)
    elif model_kind == "segtran25d":
        from ..models.segtran25d import Segtran25d
        model = Segtran25d(cfg)
    elif model_kind == "unet2d":
        from ..models.unet2d import VanillaUNet
        poly = pth_args.get("polyformer_mode")
        model = VanillaUNet(num_classes=pth_args.get("num_classes", 3),
                            polyformer_mode=poly,
                            num_attractors=pth_args.get("num_attractors",
                                                        256))
    else:
        raise ValueError(model_kind)

    example = example_input_for(model_kind, cfg, pth_args)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, example)
    params = assign_converted(params, conv_params, strict=strict)
    batch_stats = assign_converted(rest.get("batch_stats", {}), conv_stats,
                                   strict=strict)
    path = save_checkpoint(out_dir, iter_num, params, batch_stats, cfg=cfg)
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {pth_path} -> {path} ({n/1e6:.1f}M params, "
          f"iter {iter_num})")
    return path, cfg


def _convert_zoo_pth(model_kind, sd_np, pth_args, iter_num, out_dir,
                     strict):
    """Zoo nets with dedicated key adapters (reference train2d.py saves
    their plain state_dicts like any other net's)."""
    from .torch_import import (convert_transunet, convert_deeplab,
                               convert_setr, convert_attunet, convert_dunet,
                               convert_nestedunet, convert_unet3plus,
                               convert_vnet, convert_unet3d,
                               assign_converted)
    from ..nn.init import init_with_reference_schemes
    from ..train.checkpoint import save_checkpoint

    nc = pth_args.get("num_classes", 2)
    ps = pth_args.get("patch_size", (224, 224))
    if isinstance(ps, int):
        ps = (ps, ps)
    if model_kind == "transunet":
        from ..models.transunet import TransUNet
        model = TransUNet(num_classes=nc)
        conv_params, conv_stats = convert_transunet(sd_np)
    elif model_kind == "setr":
        from ..models.setr import SETR_PUP
        model = SETR_PUP(num_classes=nc)
        conv_params, conv_stats = convert_setr(sd_np)
    elif model_kind in ("attunet", "r2attunet"):
        from ..models.att_unet import AttUNet
        model = AttUNet(num_classes=nc, use_attention=True,
                        recurrent=(model_kind == "r2attunet"))
        conv_params, conv_stats = convert_attunet(sd_np)
    elif model_kind == "dunet":
        from ..models.dunet import DUNetV1V2
        model = DUNetV1V2(n_classes=nc)
        conv_params, conv_stats = convert_dunet(sd_np)
    elif model_kind == "nestedunet":
        from ..models.nested_unet import NestedUNet
        model = NestedUNet(num_classes=nc)
        conv_params, conv_stats = convert_nestedunet(sd_np)
    elif model_kind == "unet3plus":
        from ..models.unet_3plus import UNet3Plus
        model = UNet3Plus(num_classes=nc)
        conv_params, conv_stats = convert_unet3plus(sd_np)
    elif model_kind == "vnet":
        from ..models.vnet import VNet
        model = VNet(n_channels=pth_args.get("orig_in_channels", 1),
                     num_classes=nc, normalization="batchnorm",
                     has_dropout=True)
        conv_params, conv_stats = convert_vnet(sd_np)
    elif model_kind == "unet3d":
        from ..models.unet3d import Modified3DUNet
        model = Modified3DUNet(
            in_channels=pth_args.get("orig_in_channels", 4), num_classes=nc)
        conv_params, conv_stats = convert_unet3d(sd_np)
    elif model_kind == "unet_smp":
        from ..models.unet_smp import UnetSMP
        from .torch_import import convert_unet_smp
        model = UnetSMP(num_classes=nc,
                        encoder=pth_args.get("backbone_type", "resnet34"))
        conv_params, conv_stats = convert_unet_smp(sd_np)
    else:
        from ..models.deeplab import DeepLabV3Plus, DeepLabV3
        bb = pth_args.get("backbone_type", "resnet50")
        cls = DeepLabV3Plus if model_kind == "deeplabv3plus" else DeepLabV3
        model = cls(num_classes=nc, backbone=bb)
        conv_params, conv_stats = convert_deeplab(sd_np)

    if model_kind in ("vnet", "unet3d"):
        c_in = pth_args.get("orig_in_channels", 1 if model_kind == "vnet"
                            else 4)
        example = jnp.zeros((1, 16, 16, 16, c_in), jnp.float32)
    else:
        example = jnp.zeros((1,) + tuple(ps) + (3,), jnp.float32)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, example)
    params = assign_converted(params, conv_params, strict=strict)
    batch_stats = assign_converted(rest.get("batch_stats", {}), conv_stats,
                                   strict=strict)
    path = save_checkpoint(out_dir, iter_num, params, batch_stats)
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {model_kind} -> {path} ({n/1e6:.1f}M params, "
          f"iter {iter_num})")
    return path, None


def convert_timm_backbone(pth_path: str, out_dir: str, variant: str):
    """Import a raw timm EfficientNetV2 checkpoint (the reference's
    pretrained-backbone source, segtran2d.py:106-117) as an orbax payload
    holding only the ``backbone`` subtree; feed it to train2d --cp to start
    --bb effv2{s,m,l} training from ImageNet(-21k) weights."""
    import torch
    from .torch_import import convert_timm_effv2, assign_converted
    from ..nn.backbones.efficientnetv2 import EfficientNetV2Features
    from ..nn.init import init_with_reference_schemes
    from ..train.checkpoint import save_checkpoint

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd_np = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    conv_params, conv_stats = convert_timm_effv2(sd_np)

    bb = EfficientNetV2Features(variant=variant, stem_stride=1)
    params, rest = init_with_reference_schemes(
        bb, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = assign_converted(params, conv_params, strict=True)
    batch_stats = assign_converted(rest.get("batch_stats", {}), conv_stats,
                                   strict=True)
    path = save_checkpoint(out_dir, 0, {"backbone": params},
                           {"backbone": batch_stats})
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    print(f"converted timm {variant} {pth_path} -> {path} "
          f"({n/1e6:.1f}M params)")
    return path


def convert_eff_backbone(pth_path: str, out_dir: str, variant: str,
                         stem_stride: int = 1):
    """Import a raw EfficientNet checkpoint (the reference's pretrained
    advprop weights, efficientnet/model.py from_pretrained) as a
    backbone-only orbax payload for train2d --cp. Our flax scopes mirror the
    vendored module names (_conv_stem, _blocks.{i}._expand_conv, ...), so
    the generic mapper covers it; only the classification head is dropped."""
    import torch
    from .torch_import import convert_state_dict, assign_converted
    from ..nn.backbones.efficientnet import EfficientNetFeatures
    from ..nn.init import init_with_reference_schemes
    from ..train.checkpoint import save_checkpoint

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd_np = {k: v.numpy() for k, v in sd.items()
             if hasattr(v, "numpy") and not k.startswith("_fc.")}
    conv_params, conv_stats = convert_state_dict(sd_np, tie_qk_shared=False)

    bb = EfficientNetFeatures(variant=variant, stem_stride=stem_stride)
    params, rest = init_with_reference_schemes(
        bb, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = assign_converted(params, conv_params, strict=True)
    batch_stats = assign_converted(rest.get("batch_stats", {}), conv_stats,
                                   strict=True)
    path = save_checkpoint(out_dir, 0, {"backbone": params},
                           {"backbone": batch_stats})
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {variant} backbone {pth_path} -> {path} "
          f"({n/1e6:.1f}M params)")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="segtran2d",
                   choices=["segtran2d", "segtran3d", "segtran25d",
                            "unet2d"] + sorted(_ZOO_KINDS))
    p.add_argument("--timm-bb", dest="timm_bb", default=None,
                   choices=["effv2s", "effv2m", "effv2l"],
                   help="treat --pth as a raw timm EfficientNetV2 checkpoint "
                        "and emit a backbone-only payload for train2d --cp")
    p.add_argument("--eff-bb", dest="eff_bb", default=None,
                   choices=[f"eff-b{i}" for i in range(8)],
                   help="treat --pth as a raw EfficientNet (advprop) "
                        "checkpoint and emit a backbone-only payload")
    p.add_argument("--stemstride", dest="stem_stride", type=int, default=1,
                   help="backbone stem stride for --eff-bb (1 = the "
                        "bb_feat_upsize default)")
    p.add_argument("--strict", action="store_true")
    args = p.parse_args(argv)
    if args.timm_bb:
        convert_timm_backbone(args.pth, args.out, args.timm_bb)
    elif args.eff_bb:
        convert_eff_backbone(args.pth, args.out, args.eff_bb,
                             args.stem_stride)
    else:
        convert_pth(args.pth, args.out, args.model, args.strict)


if __name__ == "__main__":
    main()

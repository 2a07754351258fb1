"""End-to-end Segtran2d parity vs the reference PyTorch model (oracle only).

Builds the reference Segtran2d with random weights (no pretrained download),
converts its state_dict with our generic converter, and compares logits. This
validates the EfficientNet/ResNet backbones (incl. static SAME padding and BN
eval stats), both FPNs, the mask pooling, positional coords, the fusion
transformer, and the head resize in one shot.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _import_reference_segtran2d():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # The reference imports timm (efficientnetv2) and train_util (imgaug) at
    # module level; neither is needed for the eff-b4/resnet paths under test.
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        for name in ("tf_efficientnetv2_s_in21k", "tf_efficientnetv2_m_in21k",
                     "tf_efficientnetv2_l_in21k"):
            setattr(timm_models, name, None)
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
    if "train_util" not in sys.modules:
        tu = types.ModuleType("train_util")
        tu.batch_norm = None
        sys.modules["train_util"] = tu
    import networks.segtran2d as ref_segtran2d
    return ref_segtran2d


def build_reference_model(backbone="eff-b4", translayers=2,
                          compress=(1.0, 1.0, 2.0), num_classes=3,
                          num_attractors=8, in_fpn="34", out_fpn="1234"):
    ref = _import_reference_segtran2d()
    from argparse import Namespace
    cfg = ref.Segtran2dConfig()
    cfg.backbone_type = backbone
    cfg.bb_feat_dims = ref.bb2feat_dims[backbone]
    cfg.use_pretrained = False
    cfg.device = "cpu"
    cfg.num_translayers = translayers
    cfg.num_attractors = num_attractors
    cfg.num_classes = num_classes
    cfg.use_global_bias = False
    cfg.use_attn_consist_loss = False
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    fpn = Namespace(in_fpn_layers=in_fpn, out_fpn_layers=out_fpn,
                    in_fpn_scheme="AN", out_fpn_scheme="AN",
                    translayer_compress_ratios=list(compress))
    cfg.set_fpn_layers("test", fpn, do_print=False)
    model = ref.Segtran2d(cfg)
    model.eval()
    return model, cfg


@pytest.mark.parametrize("backbone", ["eff-b4", "resnet50"])
def test_segtran2d_full_parity(backbone):
    import jax
    import jax.numpy as jnp
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.convert import convert_state_dict, assign_converted

    torch.manual_seed(7)
    ref_model, _ = build_reference_model(backbone=backbone)
    x = torch.randn(2, 3, 96, 96)
    with torch.no_grad():
        y_ref = ref_model(x).numpy()  # [B, C, H, W]

    cfg = Segtran2dConfig(
        backbone_type=backbone, num_classes=3, num_attractors=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0))
    model = Segtran2d(cfg)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    conv_params, conv_stats = convert_state_dict(sd, tie_qk_shared=True)
    params = assign_converted(params, conv_params)
    batch_stats = assign_converted(rest["batch_stats"], conv_stats)

    y = model.apply({"params": params, "batch_stats": batch_stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)


def test_segtran2d_convtranspose_head_parity():
    """out_fpn_layers == in_fpn_layers with '2' not in in_fpn: the head is a
    2x ConvTranspose2d (reference segtran2d.py:205-208). Validates the flax
    ConvTranspose numerics and the converter's [I,O,kh,kw] kernel layout."""
    import jax
    import jax.numpy as jnp
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.models import Segtran2d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.convert import convert_state_dict, assign_converted

    torch.manual_seed(11)
    ref_model, _ = build_reference_model(backbone="eff-b0", translayers=1,
                                         compress=(1.0, 1.0),
                                         in_fpn="34", out_fpn="34")
    x = torch.randn(2, 3, 96, 96)
    with torch.no_grad():
        y_ref = ref_model(x).numpy()

    cfg = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=3, num_attractors=8,
        in_fpn_layers=(3, 4), out_fpn_layers=(3, 4),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran2d(cfg)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    # same auto-detection rule as convert/cli.py
    transposed = frozenset(
        k[:-len(".weight")] for k, v in sd.items()
        if k.endswith("out_conv.weight") and v.ndim in (4, 5)
        and any(s > 1 for s in v.shape[2:]))
    assert transposed == {"out_conv"}
    conv_params, conv_stats = convert_state_dict(
        sd, tie_qk_shared=True, transposed_conv_paths=transposed)
    params = assign_converted(params, conv_params)
    batch_stats = assign_converted(rest["batch_stats"], conv_stats)

    y = model.apply({"params": params, "batch_stats": batch_stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

"""SETR-PUP converter + full-model parity vs the reference (torch oracle).

The reference builds SETR from its vendored mmseg tree (train2d.py:954-974).
mmcv itself is absent from this container and the vendored vit.py imports the
long-removed ``torch._six``, so this test loads ONLY the three model files the
fundus SETR actually uses (backbones/vit.py, decode_heads/decode_head.py,
decode_heads/vit_up_head.py) under a synthetic package with minimal stubs for
their mmcv/mmseg imports, then reproduces ``EncoderDecoder.encode_decode``
(encoder_decoder.py:84-94) by hand: backbone -> up-head -> bilinear resize.

Covers the fused-qkv ViT blocks, cls-token/pos-embed handling, the up-head's
%48 cls-drop quirk, the conv+BN+ReLU+2x-bilinear chain, and the converter's
generic mapping of the whole state_dict (auxiliary heads / conv_seg dropped).
"""
import collections.abc
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
SETR_DIR = os.path.join(REF, "networks/setr/mmseg/models")
pytestmark = pytest.mark.skipif(not os.path.isdir(SETR_DIR),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(name, path=None):
    mod = types.ModuleType(name)
    mod.__path__ = [path] if path else []
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_setr_modules():
    """Load the vendored vit.py / vit_up_head.py with stubbed deps."""
    import torch.nn as tnn
    import torch.nn.functional as F

    saved = dict(sys.modules)

    # torch._six was removed in torch>=1.9; vit.py only wants container_abcs
    six = types.ModuleType("torch._six")
    six.container_abcs = collections.abc
    sys.modules["torch._six"] = six

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmcv = _pkg("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.build_norm_layer = (
        lambda cfg, num_features: ("bn", tnn.BatchNorm2d(num_features)))
    mmcv_cnn.normal_init = lambda *a, **k: None
    sys.modules["mmcv.cnn"] = mmcv_cnn
    mmcv_runner = types.ModuleType("mmcv.runner")
    mmcv_runner.auto_fp16 = lambda *a, **k: (lambda f: f)
    mmcv_runner.force_fp32 = lambda *a, **k: (lambda f: f)
    sys.modules["mmcv.runner"] = mmcv_runner
    mmcv.cnn, mmcv.runner = mmcv_cnn, mmcv_runner

    mmseg = _pkg("mmseg")
    mmseg_core = types.ModuleType("mmseg.core")
    mmseg_core.build_pixel_sampler = lambda *a, **k: None
    sys.modules["mmseg.core"] = mmseg_core
    mmseg_ops = types.ModuleType("mmseg.ops")
    mmseg_ops.resize = (
        lambda input, size=None, scale_factor=None, mode="bilinear",
        align_corners=False, warning=True:
        F.interpolate(input, size=size, scale_factor=scale_factor,
                      mode=mode, align_corners=align_corners))
    sys.modules["mmseg.ops"] = mmseg_ops
    mmseg.core, mmseg.ops = mmseg_core, mmseg_ops

    root = _pkg("refsetr")
    builder = types.ModuleType("refsetr.builder")
    builder.BACKBONES = _Registry()
    builder.HEADS = _Registry()
    builder.build_loss = lambda cfg: None
    sys.modules["refsetr.builder"] = builder
    losses = types.ModuleType("refsetr.losses")
    losses.accuracy = lambda *a, **k: None
    sys.modules["refsetr.losses"] = losses
    root.builder, root.losses = builder, losses

    _pkg("refsetr.decode_heads", os.path.join(SETR_DIR, "decode_heads"))
    _pkg("refsetr.backbones", os.path.join(SETR_DIR, "backbones"))
    _load("refsetr.backbones.helpers",
          os.path.join(SETR_DIR, "backbones/helpers.py"))
    vit = _load("refsetr.backbones.vit",
                os.path.join(SETR_DIR, "backbones/vit.py"))
    _load("refsetr.decode_heads.decode_head",
          os.path.join(SETR_DIR, "decode_heads/decode_head.py"))
    up = _load("refsetr.decode_heads.vit_up_head",
               os.path.join(SETR_DIR, "decode_heads/vit_up_head.py"))
    yield vit, up

    for k in list(sys.modules):
        if k not in saved:
            del sys.modules[k]
        else:
            sys.modules[k] = saved[k]


def test_setr_pup_full_parity(ref_setr_modules):
    import jax
    import jax.numpy as jnp
    from segtran_tpu.models.setr import SETR_PUP
    from segtran_tpu.convert.torch_import import (convert_setr,
                                                  assign_converted)

    vit_mod, up_mod = ref_setr_modules
    img, patch, dim, depth, heads = 96, 16, 64, 2, 4

    torch.manual_seed(7)
    backbone = vit_mod.VisionTransformer(
        model_name="vit_large_patch16_384", img_size=img, patch_size=patch,
        in_chans=3, embed_dim=dim, depth=depth, num_heads=heads,
        num_classes=3, drop_rate=0.0, norm_cfg=dict(type="BN"),
        pos_embed_interp=True, align_corners=False)
    head = up_mod.VisionTransformerUpHead(
        img_size=img, embed_dim=dim, norm_cfg=dict(type="BN"), num_conv=4,
        upsampling_method="bilinear", num_upsampe_layer=4, in_channels=dim,
        channels=512, in_index=depth - 1, num_classes=3, align_corners=False)
    backbone.eval()
    head.eval()
    # randomize the BN running stats so the converter's batch_stats mapping
    # is actually exercised (fresh BNs are mean 0 / var 1)
    for m in head.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        # encoder_decoder.py:84-94 encode_decode, by hand
        outs = backbone(x)
        logit = head.forward_test(list(outs), None, None)
        y_ref = torch.nn.functional.interpolate(
            logit, size=x.shape[2:], mode="bilinear",
            align_corners=False).numpy()

    model = SETR_PUP(num_classes=3, patch=patch, embed_dim=dim, depth=depth,
                     num_heads=heads, drop_rate=0.0)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)

    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in backbone.state_dict().items()}
    sd.update({f"decode_head.{k}": v.detach().numpy()
               for k, v in head.state_dict().items()})
    # the quirk branch the fundus config exercises: (N+1) % 48 != 0 drops cls
    assert ((img // patch) ** 2 + 1) % 48 != 0
    conv_params, conv_stats = convert_setr(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)

    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

"""unet-smp converter + full-model parity vs the reference (torch oracle).

The vendored segmentation_models_pytorch package top-level import needs
torchvision/pretrainedmodels/efficientnet_pytorch (absent here), but its
Unet DECODER subtree (unet/decoder.py + base/) only needs torch -- so the
oracle loads those files under a synthetic package and composes the exact
smp.Unet forward (base/model.py:13-21): ResNetEncoder stage taps
(encoders/resnet.py:47-55, replayed on the reference's own code/resnet.py
modules, whose state-dict naming equals torchvision's) -> UnetDecoder ->
SegmentationHead.
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
SMP_DIR = os.path.join(REF, "networks", "segmentation_models_pytorch")
pytestmark = pytest.mark.skipif(not os.path.isdir(SMP_DIR),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _load_smp_decoder_pkg():
    """Import smp's base/ and unet/decoder.py without executing the package
    __init__ (which pulls the heavy encoder deps)."""
    if "smpref" not in sys.modules:
        pkg = types.ModuleType("smpref")
        pkg.__path__ = [SMP_DIR]
        sys.modules["smpref"] = pkg
        sub = types.ModuleType("smpref.unet")
        sub.__path__ = [os.path.join(SMP_DIR, "unet")]
        sys.modules["smpref.unet"] = sub
    base = importlib.import_module("smpref.base")
    decoder = importlib.import_module("smpref.unet.decoder")
    return base, decoder


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.5)


def test_unet_smp_resnet34_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import resnet as ref_resnet

    import jax
    import jax.numpy as jnp
    from segtran_tpu.convert.torch_import import (assign_converted,
                                                  convert_unet_smp)
    from segtran_tpu.models.unet_smp import UnetSMP

    base, decoder_mod = _load_smp_decoder_pkg()
    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(11)

    enc = ref_resnet.resnet34(pretrained=False)
    dec = decoder_mod.UnetDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        decoder_channels=(256, 128, 64, 32, 16), n_blocks=5, center=False)
    head = base.SegmentationHead(16, 3, kernel_size=3)
    enc.eval(), dec.eval(), head.eval()
    with torch.no_grad():
        _randomize_bn_stats(enc, gen)
        _randomize_bn_stats(dec, gen)

        x = torch.randn(2, 3, 64, 64, generator=gen)
        # smp ResNetEncoder stages (encoders/resnet.py:47-55): the stride-2
        # skip is the PRE-maxpool stem
        f1 = enc.relu(enc.bn1(enc.conv1(x)))
        f2 = enc.layer1(enc.maxpool(f1))
        f3 = enc.layer2(f2)
        f4 = enc.layer3(f3)
        f5 = enc.layer4(f4)
        y_ref = head(dec(x, f1, f2, f3, f4, f5)).numpy()

    sd = {}
    for k, v in enc.state_dict().items():
        if not k.startswith(("fc.", "avgpool.")):
            sd["encoder." + k] = v.numpy()
    for k, v in dec.state_dict().items():
        sd["decoder." + k] = v.numpy()
    for k, v in head.state_dict().items():
        sd["segmentation_head." + k] = v.numpy()

    model = UnetSMP(num_classes=3, encoder="resnet34")
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_j, train=False)
    conv_params, conv_stats = convert_unet_smp(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)
    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

"""NestedUNet (UNet++) and UNet_3Plus converter + full-model parity vs the
reference torch oracles (networks/nested_unet.py, networks/unet_3plus/).

Covers the nested dense-skip grid with align_corners=True upsampling
(nested_unet.py:76), deep supervision heads, and UNet3+'s full-scale skip
fusion (maxpool-down / bilinear-up branches, default align_corners=False
Upsample) plus convert_unet3plus's Sequential-index renames."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _randomize_bn_stats(net):
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)


def _to_jax(x):
    import jax.numpy as jnp
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


@pytest.mark.parametrize("deep", [False, True])
def test_nestedunet_full_parity(deep):
    import jax
    from segtran_tpu.models.nested_unet import NestedUNet
    from segtran_tpu.convert.torch_import import (convert_nestedunet,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.nested_unet import NestedUNet as RefNested

    torch.manual_seed(3)
    ref = RefNested(num_classes=3, input_channels=3, deep_supervision=deep)
    ref.eval()
    _randomize_bn_stats(ref)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_ref = ref(x)

    model = NestedUNet(num_classes=3, deep_supervision=deep)
    x_j = _to_jax(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_nestedunet(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)
    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    if deep:
        for yj, yt in zip(y, y_ref):
            np.testing.assert_allclose(
                np.asarray(yj).transpose(0, 3, 1, 2), yt.numpy(),
                rtol=1e-3, atol=2e-4)
    else:
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), y_ref.numpy(),
            rtol=1e-3, atol=2e-4)


def test_unet3plus_full_parity():
    import jax
    from segtran_tpu.models.unet_3plus import UNet3Plus
    from segtran_tpu.convert.torch_import import (convert_unet3plus,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.unet_3plus.unet_3plus import UNet_3Plus as RefU3P

    torch.manual_seed(9)
    ref = RefU3P(in_channels=3, num_classes=3)
    ref.eval()
    _randomize_bn_stats(ref)
    # 32 = 2^5: every maxpool branch (down to 8x) divides evenly, so
    # ceil_mode is moot
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = UNet3Plus(num_classes=3)
    x_j = _to_jax(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_unet3plus(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)
    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

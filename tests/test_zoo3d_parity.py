"""VNet and Modified3DUNet converter + full-model parity vs the reference
torch oracles (networks/vnet.py, networks/unet3d.py).

Covers the VNet additive-skip encoder/decoder with ConvTranspose3d
upsampling (converter spatial flip) at the reference's train3d wiring
(n_channels=1, batchnorm), and Modified3DUNet's context/localization
pathways incl. the doubly-applied shared norm_lrelu_conv blocks
(unet3d.py:115-118) and the deep-supervision sum."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _to_jax(x):
    import jax.numpy as jnp
    # NCDHW -> [B, D, H, W, C] channels-last
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def test_vnet_full_parity():
    import jax
    from segtran_tpu.models.vnet import VNet
    from segtran_tpu.convert.torch_import import (convert_vnet,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.vnet import VNet as RefVNet

    torch.manual_seed(13)
    # the train3d wiring: VNet(n_channels=1, num_classes, 'batchnorm',
    # has_dropout=True) -- dropout is inert in eval
    ref = RefVNet(n_channels=1, num_classes=2, normalization="batchnorm",
                  has_dropout=True)
    ref.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(1, 1, 16, 16, 16)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = VNet(n_channels=1, num_classes=2, normalization="batchnorm",
                 has_dropout=True)
    x_j = _to_jax(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_vnet(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)
    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 4, 1, 2, 3)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)


def test_unet3d_full_parity():
    import jax
    from segtran_tpu.models.unet3d import Modified3DUNet
    from segtran_tpu.convert.torch_import import (convert_unet3d,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.unet3d import Modified3DUNet as RefU3D

    torch.manual_seed(17)
    ref = RefU3D(in_channels=4, num_classes=4, base_n_filter=8)
    ref.eval()
    # 32^3: the 16x-downsampled bottleneck keeps >1 spatial element, which
    # torch InstanceNorm3d requires
    x = torch.randn(1, 4, 32, 32, 32)
    with torch.no_grad():
        _, seg_layer = ref(x)
        y_ref = seg_layer.numpy()

    model = Modified3DUNet(in_channels=4, num_classes=4, base_n_filter=8)
    x_j = _to_jax(x)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_unet3d(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    assert not conv_stats, "InstanceNorm3d tracks no running stats"
    y = model.apply({"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    x_j, train=False)
    y = np.asarray(y).transpose(0, 4, 1, 2, 3)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

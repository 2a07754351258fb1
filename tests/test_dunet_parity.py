"""DUNetV1V2 converter + full-model parity vs the reference (torch oracle,
networks/deformable_unet/).

Covers the pure-PyTorch DeformConv2d numerics exactly -- border-clamped
bilinear sampling with the upper-edge double-count, the padding=0 one-pixel
grid shift (deform_part.py:12), the tap ordering through _reshape_x_offset's
stride-k conv -- plus the align_corners=True decoder upsample and
convert_dunet's wrapper-collapsing renames. Offsets are randomized (the
zero-init weight would make the deform path degenerate)."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def test_dunet_full_parity():
    import jax
    import jax.numpy as jnp
    from segtran_tpu.models.dunet import DUNetV1V2
    from segtran_tpu.convert.torch_import import (convert_dunet,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.deformable_unet.deform_unet import DUNetV1V2 as RefDUNet

    torch.manual_seed(5)
    ref = RefDUNet(n_channels=3, n_classes=3)
    ref.eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            # p_conv weights are zero-initialized; give them real values so
            # the deformable sampling (not just the degenerate grid) is
            # exercised; keep them small so offsets stay sub-pixel-ish
            if "p_conv.weight" in name:
                p.normal_(0.0, 0.05)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = DUNetV1V2(n_channels=3, n_classes=3)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_dunet(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)

    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

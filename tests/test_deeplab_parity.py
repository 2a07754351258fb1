"""DeepLabV3/V3+ converter + full-model parity vs the reference (torch
oracle): dilated-resnet backbone (output_stride 8), ASPP, both heads."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _convert_and_compare(ref_model, our_model, img=64):
    import jax
    import jax.numpy as jnp
    from segtran_tpu.convert.torch_import import (convert_deeplab,
                                                  assign_converted)

    ref_model.eval()
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        y_ref = ref_model(x).numpy()

    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = our_model.init({"params": jax.random.PRNGKey(0)}, x_j,
                               False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    conv_params, conv_stats = convert_deeplab(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)
    y = our_model.apply({"params": params, "batch_stats": stats}, x_j,
                        train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)


def test_deeplabv3plus_resnet50_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import networks.deeplab as ref_dl
    from segtran_tpu.models.deeplab import DeepLabV3Plus

    torch.manual_seed(5)
    ref = ref_dl.deeplabv3plus_resnet50(num_classes=3, output_stride=8,
                                        pretrained_backbone=False)
    _convert_and_compare(ref, DeepLabV3Plus(num_classes=3,
                                            backbone="resnet50"))


def test_deeplabv3_resnet50_parity():
    """The reference's own deeplabv3 forward crashes upstream
    (utils.py:18 reads features['low_level'], which the V3 return_layers
    never produce), so the oracle replays the intended forward -- backbone
    'out' -> DeepLabHead -> bilinear resize (utils.py:14-23 minus the broken
    feature_maps bookkeeping)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch.nn.functional as F
    import networks.deeplab as ref_dl
    from segtran_tpu.models.deeplab import DeepLabV3

    torch.manual_seed(6)
    ref = ref_dl.deeplabv3_resnet50(num_classes=3, output_stride=8,
                                    pretrained_backbone=False)

    class _FixedForward(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, x):
            feats = self.m.backbone(x)
            y = self.m.classifier(feats)
            return F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                                 align_corners=False)

        def state_dict(self):
            return self.m.state_dict()

    _convert_and_compare(_FixedForward(ref),
                         DeepLabV3(num_classes=3, backbone="resnet50"))

"""AttU_Net / R2AttU_Net converter + full-model parity vs the reference
(torch oracle, networks/att_unet.py).

Covers conv_block/up_conv/Attention_block/RRCNN_block numerics (incl. the
shared-conv recurrent iteration :60-78) and convert_attunet's RRCNN ->
Conv scope renames for the R2 variant, at the reference's full channel
widths (64..1024) on a small input."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _ref_module(name):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import networks.att_unet as m
    return getattr(m, name)


def _randomize_bn_stats(net):
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)


@pytest.mark.parametrize("ref_name,recurrent", [
    ("AttU_Net", False),
    ("R2AttU_Net", True),
])
def test_attunet_full_parity(ref_name, recurrent):
    import jax
    import jax.numpy as jnp
    from segtran_tpu.models.att_unet import AttUNet
    from segtran_tpu.convert.torch_import import (convert_attunet,
                                                  assign_converted)

    cls = _ref_module(ref_name)
    torch.manual_seed(11)
    ref = cls(img_ch=3, output_ch=3)
    ref.eval()
    _randomize_bn_stats(ref)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = AttUNet(num_classes=3, use_attention=True, recurrent=recurrent)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_attunet(sd)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)

    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

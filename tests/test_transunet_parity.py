"""TransUNet converter + full-model parity vs the reference (torch oracle).

Builds the reference VisionTransformer (vendored vit_seg_modeling.py) with a
shrunken R50-ViT config, converts its random state_dict with
convert_transunet, and asserts full-logits agreement -- covering the
ResNetV2 hybrid (StdConv weight standardization, GroupNorm, the maxpool/
zero-pad skip quirk), the ViT encoder, the DecoderCup (align_corners=True
upsampling) and the segmentation head as one chain."""
import copy
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def test_transunet_full_parity():
    import jax
    import jax.numpy as jnp
    from segtran_tpu.models.transunet import TransUNet
    from segtran_tpu.convert.torch_import import (convert_transunet,
                                                  assign_converted)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.transunet.vit_seg_modeling import (VisionTransformer,
                                                     CONFIGS)

    cfg = copy.deepcopy(CONFIGS["R50-ViT-B_16"])
    cfg.hidden_size = 96
    cfg.transformer.num_layers = 2
    cfg.transformer.num_heads = 4
    cfg.transformer.mlp_dim = 192
    cfg.transformer.dropout_rate = 0.0
    cfg.transformer.attention_dropout_rate = 0.0
    cfg.resnet.num_layers = (1, 1, 2)
    cfg.n_classes = 3
    # train2d.py:981 sets grid = patch_size / 16 -> 1x1 patch embedding
    img = 96
    cfg.patches.grid = (img // 16, img // 16)

    torch.manual_seed(41)
    ref = VisionTransformer(cfg, img_size=img, num_classes=3)
    ref.eval()
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = TransUNet(num_classes=3, hidden_dim=96, num_layers=2,
                      num_heads=4, mlp_dim=192, resnet_units=(1, 1, 2))
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_j, False)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_transunet(sd, num_heads=4)
    params = assign_converted(variables["params"], conv_params, strict=True)
    stats = assign_converted(variables["batch_stats"], conv_stats,
                             strict=True)

    y = model.apply({"params": params, "batch_stats": stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)

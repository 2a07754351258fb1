"""--eff-bb backbone import: raw EfficientNet .pth -> backbone-only orbax
payload, endpoint parity vs the reference's vendored EfficientNet (the
advprop pretrained source, reference efficientnet/model.py from_pretrained;
segtran2d.py:98-104)."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def test_eff_backbone_cli_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from efficientnet.model import EfficientNet

    torch.manual_seed(9)
    ref = EfficientNet.from_name("efficientnet-b0", stem_stride=1)
    ref.eval()
    pth = str(tmp_path / "advprop.pth")
    torch.save(ref.state_dict(), pth)

    from segtran_tpu.convert.cli import convert_eff_backbone
    out = str(tmp_path / "bb")
    path = convert_eff_backbone(pth, out, "eff-b0", stem_stride=1)

    # payload shape: backbone-only subtree train2d --cp can merge
    from segtran_tpu.train.checkpoint import load_checkpoint
    payload = load_checkpoint(path)
    assert set(payload["params"].keys()) == {"backbone"}

    # endpoint parity on a fixed input
    from segtran_tpu.nn.backbones.efficientnet import EfficientNetFeatures
    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    bb = EfficientNetFeatures(variant="eff-b0", stem_stride=1)
    ours = bb.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray,
                                          payload["params"]["backbone"]),
         "batch_stats": jax.tree_util.tree_map(
             jnp.asarray, payload["batch_stats"]["backbone"])},
        jnp.asarray(x), False)
    with torch.no_grad():
        eps = ref.extract_endpoints(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    refs = [eps[f"reduction_{i}"] for i in range(1, 6)]
    assert len(ours) == len(refs)
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(np.asarray(o),
                                   r.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)

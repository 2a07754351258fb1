"""End-to-end .pth -> orbax conversion: build the reference Segtran2d, save a
reference-format .pth, convert, and verify logits parity through the
converted checkpoint (the exact path released REFUGE weights will take)."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def test_pth_roundtrip(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_segtran2d_parity import build_reference_model

    import jax
    import jax.numpy as jnp

    torch.manual_seed(9)
    ref_model, ref_cfg = build_reference_model(
        backbone="eff-b4", translayers=2, compress=(1.0, 1.0, 2.0),
        num_classes=3, num_attractors=8)
    x = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        y_ref = ref_model(x).numpy()

    pth_path = str(tmp_path / "iter_100.pth")
    torch.save({
        "iter_num": 100,
        "model": ref_model.state_dict(),
        "args": {
            "backbone_type": "eff-b4", "num_classes": 3,
            "num_attractors": 8, "num_translayers": 2,
            "translayer_compress_ratios": [1.0, 1.0, 2.0],
            "in_fpn_layers": "34", "out_fpn_layers": "1234",
            "qk_have_bias": True, "tie_qk_scheme": "shared",
            "patch_size": (96, 96),
        },
    }, pth_path)

    from segtran_tpu.convert.cli import convert_pth
    out_path, cfg = convert_pth(pth_path, str(tmp_path / "converted"),
                                "segtran2d")

    from segtran_tpu.models import Segtran2d
    from segtran_tpu.train.checkpoint import load_checkpoint
    payload = load_checkpoint(out_path, cfg)
    model = Segtran2d(cfg)
    y = model.apply({"params": payload["params"],
                     "batch_stats": payload["batch_stats"]},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                               rtol=1e-3, atol=2e-4)

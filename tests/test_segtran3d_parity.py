"""End-to-end Segtran3d (I3D backbone) parity vs the reference (oracle)."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

torch = pytest.importorskip("torch")


def _import_reference_segtran3d():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "train_util" not in sys.modules:
        tu = types.ModuleType("train_util")
        tu.batch_norm = None
        sys.modules["train_util"] = tu
    import networks.segtran3d as ref_segtran3d
    return ref_segtran3d


class _CudaFreeTensor:
    """The reference hardcodes torch.tensor(..., device='cuda') in
    Segtran3d.forward (segtran3d.py:464); shim it for the CPU oracle run."""
    def __enter__(self):
        self._orig = torch.tensor

        def shim(*args, **kwargs):
            if kwargs.get("device") == "cuda":
                kwargs.pop("device")
            return self._orig(*args, **kwargs)
        torch.tensor = shim
        return self

    def __exit__(self, *exc):
        torch.tensor = self._orig


def test_segtran3d_full_parity():
    import jax
    import jax.numpy as jnp
    from segtran_tpu.configs import Segtran3dConfig
    from segtran_tpu.models.segtran3d import Segtran3d
    from segtran_tpu.nn.init import init_with_reference_schemes
    from segtran_tpu.convert import convert_state_dict, assign_converted

    ref = _import_reference_segtran3d()
    from argparse import Namespace
    torch.manual_seed(11)
    rcfg = ref.Segtran3dConfig()
    rcfg.use_pretrained = False
    rcfg.device = "cpu"
    rcfg.num_translayers = 1
    rcfg.num_attractors = 8
    rcfg.num_classes = 4
    rcfg.orig_in_channels = 4
    rcfg.hidden_dropout_prob = 0.0
    rcfg.attention_probs_dropout_prob = 0.0
    fpn = Namespace(in_fpn_layers="34", out_fpn_layers="1234",
                    in_fpn_scheme="AN", out_fpn_scheme="AN",
                    translayer_compress_ratios=[1, 1])
    rcfg.set_fpn_layers("test", fpn, do_print=False)
    ref_model = ref.Segtran3d(rcfg)
    ref_model.eval()

    x = torch.randn(1, 4, 112, 112, 16)  # [B, C, H, W, D]
    with _CudaFreeTensor(), torch.no_grad():
        y_ref = ref_model(x).numpy()   # [B, cls, H, W, D]

    cfg = Segtran3dConfig(
        num_classes=4, num_attractors=8, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    model = Segtran3d(cfg)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # [B, H, W, D, C]
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    conv_params, conv_stats = convert_state_dict(sd, tie_qk_shared=True)
    params = assign_converted(params, conv_params)
    batch_stats = assign_converted(rest["batch_stats"], conv_stats)

    y = model.apply({"params": params, "batch_stats": batch_stats}, x_j,
                    train=False)
    y = np.asarray(y).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=3e-4)

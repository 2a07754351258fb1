"""VanillaUNet + Polyformer + revgrad + discriminator parity/behavior tests."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segtran_tpu.models.unet2d import VanillaUNet  # noqa: E402
from segtran_tpu.models.discriminator import Discriminator  # noqa: E402
from segtran_tpu.adapt.revgrad import gradient_reversal  # noqa: E402
from segtran_tpu.nn.init import init_with_reference_schemes  # noqa: E402
from segtran_tpu.convert import convert_state_dict, assign_converted  # noqa: E402
from segtran_tpu.ops.resize import resize_linear_align_corners  # noqa: E402


def test_align_corners_resize_matches_torch():
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 9, 13).astype(np.float32)
    y_t = F.interpolate(torch.tensor(x), scale_factor=2, mode="bilinear",
                        align_corners=True).numpy()
    y = np.asarray(resize_linear_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (18, 26))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("poly_mode", [None, "source", "target"])
def test_unet_parity(poly_mode):
    from argparse import Namespace
    from networks.unet2d.unet_model import UNet as RefUNet

    torch.manual_seed(3)
    if poly_mode:
        pargs = Namespace(polyformer_mode=poly_mode, num_attractors=16,
                          num_modes=4,
                          tie_qk_scheme="shared" if poly_mode == "source"
                          else "loose",
                          qk_have_bias=True, pos_code_type="lsinu")
    else:
        pargs = None
    ref = RefUNet(3, 3, bilinear=True, polyformer_args=pargs)
    ref.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    model = VanillaUNet(n_channels=3, num_classes=3, bilinear=True,
                        polyformer_mode=poly_mode, num_attractors=16,
                        num_modes=4)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_state_dict(
        sd, tie_qk_shared=(poly_mode == "source"))
    params = assign_converted(params, conv_params)
    batch_stats = assign_converted(rest["batch_stats"], conv_stats)
    y = model.apply({"params": params, "batch_stats": batch_stats}, x_j,
                    train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                               rtol=2e-4, atol=2e-4)


def test_revgrad():
    def f(x):
        return jnp.sum(gradient_reversal(x, 1.0) ** 2)
    x = jnp.asarray([1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [-2.0, 4.0])
    # forward is identity
    np.testing.assert_allclose(np.asarray(gradient_reversal(x, 1.0)),
                               np.asarray(x))


def test_discriminator_parity():
    from networks.discriminator import Discriminator as RefDisc
    torch.manual_seed(5)
    ref = RefDisc(num_in_chan=3, num_classes=1, do_avgpool=True,
                  do_revgrad=True, num_base_chan=8)
    ref.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        y_ref = ref(x).numpy()
    model = Discriminator(num_classes=1, do_avgpool=True, do_revgrad=True,
                          num_base_chan=8)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv_params, conv_stats = convert_state_dict(sd, tie_qk_shared=False)
    params = assign_converted(params, conv_params)
    batch_stats = assign_converted(rest["batch_stats"], conv_stats)
    y = model.apply({"params": params, "batch_stats": batch_stats}, x_j,
                    train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)

"""SmoothDiceLoss parity vs the reference (oracle; its first call allocates a
cuda tensor -- shimmed)."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from segtran_tpu.ops.losses import smooth_dice_loss  # noqa: E402


def test_smooth_dice_matches_reference():
    from utils.losses import SmoothDiceLoss
    orig_zeros = torch.zeros

    def shim(*a, **kw):
        kw.pop("device", None)
        return orig_zeros(*a, **kw)
    torch.zeros = shim
    try:
        ref = SmoothDiceLoss(momentum=0.1)
        rng = np.random.RandomState(0)
        s1 = rng.rand(2, 16, 16).astype(np.float32)
        g1 = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
        s2 = rng.rand(2, 16, 16).astype(np.float32)
        g2 = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
        r_sm1, r_o1 = ref(torch.tensor(s1), torch.tensor(g1))
        r_sm2, r_o2 = ref(torch.tensor(s2), torch.tensor(g2))
    finally:
        torch.zeros = orig_zeros

    rd = jnp.asarray(-1.0)
    sm1, o1, rd = smooth_dice_loss(jnp.asarray(s1), jnp.asarray(g1), rd)
    sm2, o2, rd = smooth_dice_loss(jnp.asarray(s2), jnp.asarray(g2), rd)
    np.testing.assert_allclose(float(sm1), float(r_sm1), rtol=1e-5)
    np.testing.assert_allclose(float(o1), float(r_o1), rtol=1e-5)
    np.testing.assert_allclose(float(sm2), float(r_sm2), rtol=1e-5)
    np.testing.assert_allclose(float(o2), float(r_o2), rtol=1e-5)

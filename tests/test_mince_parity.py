"""Mince (multi-scale) transformer parity vs the reference oracle."""
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segtran_tpu.nn.attention import TransLayerSpec  # noqa: E402
from segtran_tpu.nn.mince import (CrossMinceAttFeatTrans, fracs_to_indices,
                                  resize_flat_features)  # noqa: E402
from segtran_tpu.nn.init import init_with_reference_schemes  # noqa: E402
from segtran_tpu.convert import convert_state_dict, assign_converted  # noqa: E402


def test_fracs_to_indices_matches_reference():
    from networks.segtran_shared import fracs_to_indices as ref_fr
    for feat_dim, props in [(64, [1, 1]), (448, [1, 1, 1, 1]),
                            (100, [0.3, 0.7]), (63, [1, 1, 1])]:
        ref_idx, _ = ref_fr(feat_dim, props)
        assert fracs_to_indices(feat_dim, props) == ref_idx


def test_mince_layer_parity():
    from networks.segtran_shared import (CrossMinceAttFeatTrans as RefMince,
                                         SegtranConfig)
    torch.manual_seed(33)
    cfg = SegtranConfig()
    cfg.in_feat_dim = 64
    cfg.feat_dim = 64
    cfg.num_modes = 4
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    cfg.use_mince_transformer = True
    cfg.mince_scales = [2, 1]
    cfg.mince_channel_props = [1, 1]
    ref = RefMince(cfg, "mince")
    ref.tie_qk("shared")
    ref.eval()

    H, W = 8, 6
    x = torch.randn(2, H * W, 64)
    with torch.no_grad():
        y_ref = ref(x, torch.Size((H, W))).numpy()

    spec = TransLayerSpec(in_feat_dim=64, feat_dim=64, num_modes=4,
                          attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0)
    model = CrossMinceAttFeatTrans(spec, mince_scales=(2, 1),
                                   mince_channel_props=(1.0, 1.0))
    x_j = jnp.asarray(x.numpy())
    # jit_init would trace the static geoshape tuple as array args
    params, _ = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x_j, (H, W),
        jit_init=False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv, _ = convert_state_dict(sd, tie_qk_shared=True)
    params = assign_converted(params, conv)
    y = model.apply({"params": params}, x_j, (H, W), deterministic=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=5e-5, atol=5e-5)


def test_resize_flat_features_matches_reference():
    from networks.segtran_shared import resize_flat_features as ref_rff
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 48, 16).astype(np.float32)  # geoshape (8, 6)
    ref = ref_rff(torch.tensor(x), torch.Size((8, 6)), scale=0.5).numpy()
    got = np.asarray(resize_flat_features(jnp.asarray(x), (8, 6), (4, 3)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

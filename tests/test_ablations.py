"""Ablation paths: multi-head output, sliding positional biases, rand/sinu
pos embedders, global-bias model, non-squeezed encoder with 'bias' codes."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/code"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segtran_tpu.nn.attention import CrossAttFeatTrans, TransLayerSpec  # noqa: E402
from segtran_tpu.nn.poscode import (SlidingPosBiases2D, SlidingPosBiases3D,
                                    SegtranPosEncoder)  # noqa: E402
from segtran_tpu.nn.init import init_with_reference_schemes  # noqa: E402
from segtran_tpu.convert import convert_state_dict, assign_converted  # noqa: E402

torch = pytest.importorskip("torch")
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference repo not available")


@needs_ref
def test_multihead_ablation_parity():
    from networks.segtran_shared import CrossAttFeatTrans as RefCross
    from networks.segtran_shared import SegtranConfig
    torch.manual_seed(13)
    cfg = SegtranConfig()
    cfg.in_feat_dim = 64
    cfg.feat_dim = 64
    cfg.num_modes = 4
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    cfg.ablate_multihead = True
    ref = RefCross(cfg, "mh")
    ref.tie_qk("shared")
    ref.eval()
    x = torch.randn(2, 10, 64)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    spec = TransLayerSpec(in_feat_dim=64, feat_dim=64, num_modes=4,
                          ablate_multihead=True,
                          attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0)
    model = CrossAttFeatTrans(spec)
    conv, _ = convert_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        tie_qk_shared=True)
    params, _ = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, jnp.asarray(x.numpy()))
    params = assign_converted(params, conv)
    y = model.apply({"params": params}, jnp.asarray(x.numpy()),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=2e-5)


@needs_ref
def test_sliding_pos_biases_2d_parity():
    from networks.segtran_shared import SlidingPosBiases2D as Ref2D
    torch.manual_seed(17)
    ref = Ref2D(pos_dim=2, pos_bias_radius=2, max_pos_size=(10, 10))
    with torch.no_grad():
        ref.biases.normal_()
        y_ref = ref(torch.Size((5, 7)), "cpu").numpy()

    model = SlidingPosBiases2D(pos_dim=2, pos_bias_radius=2)
    params = model.init(jax.random.PRNGKey(0), (5, 7))
    params = {"params": {"biases": jnp.asarray(ref.biases.detach().numpy())}}
    y = model.apply(params, (5, 7))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-6)


@needs_ref
def test_sliding_pos_biases_3d_parity():
    from networks.segtran_shared import SlidingPosBiases3D as Ref3D
    torch.manual_seed(18)
    ref = Ref3D(pos_dim=3, pos_bias_radius=1, max_pos_size=(5, 5, 5))
    with torch.no_grad():
        ref.biases.normal_()
        y_ref = ref(torch.Size((4, 3, 5)), "cpu").numpy()
    model = SlidingPosBiases3D(pos_dim=3, pos_bias_radius=1)
    params = {"params": {"biases": jnp.asarray(ref.biases.detach().numpy())}}
    y = model.apply(params, (4, 3, 5))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-6)


def test_pos_encoder_variants():
    for kind in ("rand", "sinu", "none"):
        enc = SegtranPosEncoder(pos_code_type=kind, pos_dim=2,
                                pos_embed_dim=64, ablation_shape=(4, 5))
        pos = jnp.tile(jnp.arange(20, dtype=jnp.float32)[None, :, None],
                       (2, 1, 2))
        params = enc.init(jax.random.PRNGKey(0), (4, 5), pos)
        out = enc.apply(params, (4, 5), pos)
        assert out.shape == (2, 20, 64)
        if kind == "none":
            assert float(jnp.abs(out).sum()) == 0.0


def test_bias_poscode_encoder_and_global_bias_model():
    """Non-squeezed encoder with 'bias' positional codes, and the global-bias
    ablation model (reference segtran2d.py:79-85)."""
    import dataclasses
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.nn.encoder import SegtranFusionEncoder
    from segtran_tpu.models import Segtran2d

    cfg = Segtran2dConfig(
        backbone_type="eff-b0", num_classes=2,
        use_squeezed_transformer=False, pos_code_type="bias",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 4.0))
    enc = SegtranFusionEncoder(cfg)
    vfeat = jnp.ones((1, 12, cfg.trans_in_dim)) * 0.3
    pos = jnp.tile(jnp.arange(12, dtype=jnp.float32)[None, :, None], (1, 1, 2))
    mask = jnp.ones((1, 12, 1))
    params, _ = init_with_reference_schemes(
        enc, {"params": jax.random.PRNGKey(0)}, vfeat, pos, mask, (3, 4),
        jit_init=False)
    out = enc.apply({"params": params}, vfeat, pos, mask, (3, 4))
    assert out.shape == (1, 12, cfg.trans_out_dim)

    gb_cfg = dataclasses.replace(cfg, use_global_bias=True,
                                 pos_code_type="lsinu",
                                 use_squeezed_transformer=True)
    model = Segtran2d(gb_cfg)
    x = jnp.ones((1, 32, 32, 3))
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x)
    out = model.apply({"params": params, **rest}, x)
    assert out.shape == (1, 32, 32, 2)

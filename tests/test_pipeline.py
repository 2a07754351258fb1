"""GPipe pipeline parallelism (parallel/pipeline.py): exact forward parity
with the sequential stack, reverse-mode differentiability, and the fusion-
encoder translayer pipeline vs SegtranFusionEncoder on the virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from segtran_tpu.parallel.pipeline import (gpipe, make_translayer_stage,
                                           stack_translayer_params)


def _mesh(s):
    if len(jax.devices()) < s:
        pytest.skip(f"need {s} devices")
    return Mesh(np.array(jax.devices()[:s]).reshape(s), ("model",))


@pytest.mark.parametrize("n_micro", [2, 4, 8])
def test_gpipe_toy_forward_parity(n_micro):
    S, B, D = 4, 8, 16
    mesh = _mesh(S)
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(S, D, D) * 0.3, jnp.float32),
              "b": jnp.asarray(rng.randn(S, D) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(B, 5, D), jnp.float32)

    def stage(p, xb):
        return jnp.tanh(xb @ p["w"] + p["b"])

    def sequential(params, x):
        for i in range(S):
            x = stage(jax.tree_util.tree_map(lambda l: l[i], params), x)
        return x

    y = jax.jit(lambda p, x: gpipe(stage, p, x, mesh, "model",
                                   n_micro))(params, x)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(sequential(params, x)))


def test_gpipe_gradients():
    """The scanned ppermute schedule is reverse-differentiable; grads match
    the sequential stack."""
    S, B, D = 4, 8, 12
    mesh = _mesh(S)
    rng = np.random.RandomState(1)
    params = {"w": jnp.asarray(rng.randn(S, D, D) * 0.3, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)

    def stage(p, xb):
        return jnp.tanh(xb @ p["w"])

    def sequential(p):
        v = x
        for i in range(S):
            v = stage({"w": p["w"][i]}, v)
        return jnp.sum(v ** 2)

    g_ref = jax.grad(sequential)(params)
    g = jax.grad(lambda p: jnp.sum(
        gpipe(stage, p, x, mesh, "model", 4) ** 2))(params)
    np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(g_ref["w"]),
                               rtol=1e-4, atol=1e-5)


def test_gpipe_pytree_handoff():
    """Pytree stage IO: pass-through side values ride the pipeline."""
    S, B, D = 2, 4, 8
    mesh = _mesh(S)
    rng = np.random.RandomState(2)
    params = {"w": jnp.asarray(rng.randn(S, D, D) * 0.3, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    side = jnp.asarray(rng.randn(B, D), jnp.float32)

    def stage(p, xt):
        v, s = xt
        return jnp.tanh(v @ p["w"]) + s, s

    v, s_out = gpipe(stage, params, (x, side), mesh, "model", 2)
    v_ref = (x, side)
    for i in range(S):
        v_ref = stage({"w": params["w"][i]}, v_ref)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref[0]))
    np.testing.assert_array_equal(np.asarray(s_out), np.asarray(side))


@pytest.mark.parametrize("squeezed", [True, False])
def test_translayer_pipeline_matches_encoder(squeezed):
    """4 fusion-encoder translayers pipelined over 4 devices == the
    sequential SegtranFusionEncoder, to fp32 reassociation noise."""
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.nn.encoder import SegtranFusionEncoder
    from segtran_tpu.nn.poscode import SegtranPosEncoder, gen_all_indices

    S = 4
    mesh = _mesh(S)
    cfg = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=3, num_attractors=8,
        use_squeezed_transformer=squeezed,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0,) * (S + 1))
    assert cfg.num_translayers == S
    h2 = w2 = 4
    b, n, c = 4, h2 * w2, cfg.trans_in_dim
    rng = np.random.RandomState(3)
    vfeat = jnp.asarray(rng.randn(b, n, c) * 0.5, jnp.float32)
    vmask = jnp.ones((b, n, 1), jnp.float32)
    pos = gen_all_indices((h2, w2)).reshape(1, n, 2).astype(jnp.float32)
    voxels_pos = jnp.tile(pos, (b, 1, 1))

    enc = SegtranFusionEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), vfeat, voxels_pos, vmask,
                         (h2, w2), deterministic=True)
    y_ref = enc.apply(variables, vfeat, voxels_pos, vmask, (h2, w2),
                      deterministic=True)

    pos_encoder = SegtranPosEncoder(
        pos_code_type=cfg.pos_code_type, pos_dim=cfg.pos_dim,
        pos_embed_dim=cfg.trans_in_dim, pos_bias_radius=cfg.pos_bias_radius,
        ln_eps=cfg.ln_eps, dtype=cfg.dtype)
    pos_code = pos_encoder.apply(
        {"params": variables["params"]["pos_code_layer"]}, (h2, w2),
        voxels_pos)
    stacked = stack_translayer_params(variables["params"],
                                      cfg.num_translayers)
    stage = make_translayer_stage(cfg)
    y, _, _ = jax.jit(lambda p, xt: gpipe(stage, p, xt, mesh, "model", 2))(
        stacked, (vfeat, pos_code, vmask))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("squeezed", [True, False])
def test_hetero_translayer_pipeline_layercompress(squeezed):
    """The flagship REFUGE recipe (--layercompress 1,1,2,2: translayer dims
    shrink layer to layer) pipelines over 3 devices via the padded-hand-off +
    lax.switch stages and matches the sequential encoder exactly."""
    from segtran_tpu.configs import Segtran2dConfig
    from segtran_tpu.nn.encoder import SegtranFusionEncoder
    from segtran_tpu.nn.poscode import SegtranPosEncoder, gen_all_indices
    from segtran_tpu.parallel.pipeline import (
        make_hetero_translayer_stage, stack_translayer_params_padded)

    S = 3
    mesh = _mesh(S)
    cfg = Segtran2dConfig(
        backbone_type="eff-tiny", num_classes=3, num_attractors=8,
        use_squeezed_transformer=squeezed,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    assert cfg.num_translayers == S
    dims = cfg.translayer_dims
    assert len(set(dims)) > 1, "recipe must actually be heterogeneous"
    h2 = w2 = 4
    b, n, c = 4, h2 * w2, cfg.trans_in_dim
    rng = np.random.RandomState(7)
    vfeat = jnp.asarray(rng.randn(b, n, c) * 0.5, jnp.float32)
    vmask = jnp.ones((b, n, 1), jnp.float32)
    pos = gen_all_indices((h2, w2)).reshape(1, n, 2).astype(jnp.float32)
    voxels_pos = jnp.tile(pos, (b, 1, 1))

    enc = SegtranFusionEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), vfeat, voxels_pos, vmask,
                         (h2, w2), deterministic=True)
    y_ref = enc.apply(variables, vfeat, voxels_pos, vmask, (h2, w2),
                      deterministic=True)

    pos_encoder = SegtranPosEncoder(
        pos_code_type=cfg.pos_code_type, pos_dim=cfg.pos_dim,
        pos_embed_dim=cfg.trans_in_dim, pos_bias_radius=cfg.pos_bias_radius,
        ln_eps=cfg.ln_eps, dtype=cfg.dtype)
    pos_code = pos_encoder.apply(
        {"params": variables["params"]["pos_code_layer"]}, (h2, w2),
        voxels_pos)
    stacked, shapes = stack_translayer_params_padded(
        variables["params"], cfg.num_translayers)
    stage = make_hetero_translayer_stage(cfg, shapes)
    y_pad, _, _ = jax.jit(
        lambda p, xt: gpipe(stage, p, xt, mesh, "model", 2))(
        stacked, (vfeat, pos_code, vmask))
    y = y_pad[..., :dims[-1]]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

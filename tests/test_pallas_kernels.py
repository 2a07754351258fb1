"""Pallas kernel parity (interpret mode on CPU) vs the XLA oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtran_tpu.kernels.squeezed_attention import (fused_cross_attention,
                                                    cross_attention_reference)


@pytest.mark.parametrize("g,q,n,d,f", [
    (4, 256, 1296, 448, 448),     # squeeze-out: tokens<-attractors dims vary
    (1, 256, 700, 64, 64),        # padding on N
    (2, 100, 130, 128, 256),      # padding on Q and N, F != D
])
def test_fused_cross_attention_matches_reference(g, q, n, d, f):
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.randn(g, q, d).astype(np.float32) * 0.2)
    K = jnp.asarray(rng.randn(g, n, d).astype(np.float32) * 0.2)
    V = jnp.asarray(rng.randn(g, n, f).astype(np.float32))
    out = fused_cross_attention(Q, K, V, interpret=True,
                                tile_q=128, tile_n=256)
    ref = cross_attention_reference(Q, K, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_tile_env_override(monkeypatch):
    """SEGTRAN_FLASH_TILE_Q/N (on-chip sweep knob) must override _auto_tiles
    and keep exact numerics at the overridden tiling."""
    from segtran_tpu.kernels.squeezed_attention import _auto_tiles
    assert _auto_tiles(1296, 8640) == (256, 1024)
    monkeypatch.setenv("SEGTRAN_FLASH_TILE_Q", "512")
    monkeypatch.setenv("SEGTRAN_FLASH_TILE_N", "256")
    assert _auto_tiles(1296, 8640) == (512, 256)
    rng = np.random.RandomState(7)
    Q = jnp.asarray(rng.randn(2, 200, 64).astype(np.float32) * 0.2)
    K = jnp.asarray(rng.randn(2, 300, 64).astype(np.float32) * 0.2)
    V = jnp.asarray(rng.randn(2, 300, 96).astype(np.float32))
    out = fused_cross_attention(Q, K, V, interpret=True)
    ref = cross_attention_reference(Q, K, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_cross_attention_clamp():
    """Rows with huge scores must clamp like the oracle."""
    rng = np.random.RandomState(1)
    Q = jnp.asarray(rng.randn(1, 128, 64).astype(np.float32) * 10)
    K = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32) * 10)
    V = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32))
    out = fused_cross_attention(Q, K, V, attn_clip=500.0, interpret=True)
    ref = cross_attention_reference(Q, K, V, attn_clip=500.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_fused_attention_gradients_match_reference():
    """custom_vjp backward == jax.grad through the XLA oracle."""
    from segtran_tpu.kernels.squeezed_attention import (
        fused_cross_attention_trainable)
    rng = np.random.RandomState(2)
    Q = jnp.asarray(rng.randn(2, 128, 64).astype(np.float32) * 0.3)
    K = jnp.asarray(rng.randn(2, 160, 64).astype(np.float32) * 0.3)
    V = jnp.asarray(rng.randn(2, 160, 48).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_cross_attention_trainable(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(cross_attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(Q, K, V)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_extra,dtype", [
    (0, np.float32),        # N a tile multiple
    (604, np.float32),      # padded N tile (col-masking branch)
    (0, "bfloat16"),        # training dtype
])
def test_flash_backward_matches_reference(n_extra, dtype):
    """N >= FLASH_BWD_MIN_N takes the Pallas flash backward (dQ/dK/dV
    kernels recomputing p from the saved logsumexp); gradients must match
    jax.grad through the XLA oracle."""
    from segtran_tpu.kernels.squeezed_attention import (
        FLASH_BWD_MIN_N, fused_cross_attention_trainable)
    g, q, n, d, f = 2, 100, FLASH_BWD_MIN_N + n_extra, 32, 48
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    tol = dict(rtol=2e-4, atol=2e-5) if dt == jnp.float32 \
        else dict(rtol=0.1, atol=2e-4)
    rng = np.random.RandomState(3)
    Q = jnp.asarray(rng.randn(g, q, d).astype(np.float32) * 0.2, dt)
    K = jnp.asarray(rng.randn(g, n, d).astype(np.float32) * 0.2, dt)
    V = jnp.asarray(rng.randn(g, n, f).astype(np.float32), dt)

    def loss_fused(Q, K, V):
        out = fused_cross_attention_trainable(Q, K, V)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(Q, K, V):
        out = cross_attention_reference(Q, K, V)
        return jnp.sum(out * jnp.cos(out))

    gq, gk, gv = jax.grad(loss_fused, argnums=(0, 1, 2))(Q, K, V)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(Q, K, V)
    for got, want in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), **tol)


def test_flash_backward_clamp_zero_gradient():
    """Scores pushed past attn_clip must get zero gradient through the flash
    backward, matching the clamp's derivative."""
    from segtran_tpu.kernels.squeezed_attention import (
        FLASH_BWD_MIN_N, fused_cross_attention_trainable)
    g, q, n, d, f = 1, 64, FLASH_BWD_MIN_N, 16, 16
    rng = np.random.RandomState(4)
    Q = jnp.asarray(rng.randn(g, q, d).astype(np.float32) * 10.0)
    K = jnp.asarray(rng.randn(g, n, d).astype(np.float32) * 10.0)
    V = jnp.asarray(rng.randn(g, n, f).astype(np.float32))
    clip = 1.0   # tiny clip: most scores saturate

    def loss(fn, Q, K, V):
        return jnp.sum(fn(Q, K, V, clip) ** 2)

    gq = jax.grad(lambda a, b, c: loss(
        fused_cross_attention_trainable, a, b, c))(Q, K, V)
    rq = jax.grad(lambda a, b, c: loss(
        lambda x, y, z, cl: cross_attention_reference(x, y, z, cl),
        a, b, c))(Q, K, V)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-4, atol=2e-5)


def _epilogue_xla_oracle(mid, w2, b2, scale, lnb, ws, bs, eps):
    """The exact module math (MMPrivateOutput private linear, no residual;
    FastLayerNorm-in-fp32 here; LearnedSoftAggregate pool), fp32."""
    y = jnp.einsum("bmuf,mfg->bmug", mid, w2) + b2[None, :, None, :]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mean)
    l = (y - mean) * jax.lax.rsqrt(var + eps) * scale + lnb
    s = jnp.einsum("bmuf,fo->bmuo", l, ws) + bs
    p = jax.nn.softmax(s, axis=1)
    return jnp.sum(l * p, axis=1)


@pytest.mark.parametrize("b,m,n,f,tile", [
    (2, 4, 300, 256, 128),        # N padding
    (1, 2, 512, 384, 256),
])
def test_fused_expansion_epilogue_matches_oracle(b, m, n, f, tile):
    from segtran_tpu.kernels.expansion_epilogue import (
        fused_private_output_pool)
    rng = np.random.RandomState(3)
    mid = jnp.asarray(rng.randn(b, m, n, f).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.randn(m, f, f).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(m, f).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    lnb = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(f, 1).astype(np.float32) * 0.2)
    bs = jnp.asarray(rng.randn(1).astype(np.float32))
    out = fused_private_output_pool(mid, w2, b2, scale, lnb, ws, bs,
                                    ln_eps=1e-12, tile_n=tile,
                                    interpret=True)
    ref = _epilogue_xla_oracle(mid, w2, b2, scale, lnb, ws, bs, 1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("b,m,n,a,f,tile", [
    (2, 4, 300, 48, 256, 128),    # N + attractor-axis padding
    (1, 2, 512, 128, 384, 256),
])
def test_fused_mid_epilogue_matches_oracle(b, m, n, a, f, tile):
    """fused_mid_output_pool (full fusion: gelu(P@VW1+b1) computed in-kernel)
    vs the plain-XLA chain mid = gelu(P@VW1+b1) -> epilogue oracle."""
    from segtran_tpu.kernels.expansion_epilogue import fused_mid_output_pool
    rng = np.random.RandomState(7)
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, m, n, a).astype(np.float32)), axis=-1)
    vw1 = jnp.asarray(rng.randn(b, m, a, f).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(m, f, f).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(m, f).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    lnb = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(f, 1).astype(np.float32) * 0.2)
    bs = jnp.asarray(rng.randn(1).astype(np.float32))
    out = fused_mid_output_pool(probs, vw1, b1, w2, b2, scale, lnb, ws, bs,
                                ln_eps=1e-12, tile_n=tile, interpret=True)
    mid = jax.nn.gelu(jnp.einsum("bmna,bmaf->bmnf", probs, vw1) + b1,
                      approximate=False)
    ref = _epilogue_xla_oracle(mid, w2, b2, scale, lnb, ws, bs, 1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_mid_epilogue_permode_matches_full():
    """The per-mode large-F tier must equal the all-modes full-fusion kernel
    (same math, different blocking + XLA pool)."""
    from segtran_tpu.kernels.expansion_epilogue import (
        fused_mid_output_pool, fused_mid_output_pool_permode)
    b, m, n, a, f = 2, 4, 300, 48, 256
    rng = np.random.RandomState(11)
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, m, n, a).astype(np.float32)), axis=-1)
    vw1 = jnp.asarray(rng.randn(b, m, a, f).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(m, f, f).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(m, f).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    lnb = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(f, 1).astype(np.float32) * 0.2)
    bs = jnp.asarray(rng.randn(1).astype(np.float32))
    args = (probs, vw1, b1, w2, b2, scale, lnb, ws, bs)
    full = fused_mid_output_pool(*args, ln_eps=1e-12, tile_n=128,
                                 interpret=True)
    per = fused_mid_output_pool_permode(*args, ln_eps=1e-12, tile_n=128,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(per), np.asarray(full),
                               rtol=2e-5, atol=2e-6)


def test_fused_epilogue_module_permode_dispatch(monkeypatch):
    """With a VMEM budget that only admits a single mode's W2, the module
    must route to the per-mode tier and still match the XLA path."""
    import dataclasses
    from segtran_tpu.kernels import expansion_epilogue as epi
    from segtran_tpu.nn.attention import SqueezedAttFeatTrans, TransLayerSpec

    spec = TransLayerSpec(in_feat_dim=256, feat_dim=256, num_modes=4,
                          attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0, dtype=jnp.float32)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 64, 256).astype(np.float32) * 0.2)
    mod = SqueezedAttFeatTrans(spec, num_attractors=16)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x,
                         deterministic=True)
    ref = mod.apply(variables, x, deterministic=True)
    # one mode's W2 (256*256*4) + vw1 slice fits; four modes' do not
    monkeypatch.setattr(epi, "W2_VMEM_BUDGET", 300_000)
    fast = SqueezedAttFeatTrans(
        dataclasses.replace(spec, use_fused_epilogue=True),
        num_attractors=16)
    out = fast.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("mid_type", ["shared", "private"])
def test_fused_epilogue_module_path_matches_xla(mid_type):
    """SqueezedAttFeatTrans with use_fused_epilogue on vs off (same params,
    deterministic): the module-level wiring incl. the bound-variables param
    access must reproduce the exact XLA output block + pooling. mid_type
    'shared' exercises the FULL fusion (fused_mid_output_pool on the
    reassociated attractor-out branch); 'private' the mid-streaming epilogue
    (fused_private_output_pool via _output_and_pool)."""
    import dataclasses
    from segtran_tpu.nn.attention import SqueezedAttFeatTrans, TransLayerSpec

    spec = TransLayerSpec(in_feat_dim=256, feat_dim=256, num_modes=4,
                          attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0, mid_type=mid_type,
                          dtype=jnp.float32)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 256).astype(np.float32) * 0.2)
    mod = SqueezedAttFeatTrans(spec, num_attractors=16)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x,
                         deterministic=True)
    ref = mod.apply(variables, x, deterministic=True)
    fast = SqueezedAttFeatTrans(
        dataclasses.replace(spec, use_fused_epilogue=True),
        num_attractors=16)
    out = fast.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-6)

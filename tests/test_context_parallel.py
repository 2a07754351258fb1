"""Context (sequence) parallelism: token-sharded squeezed attention must be
EXACT vs the single-device computation on the 8-device CPU mesh."""
import numpy as np

import jax
import jax.numpy as jnp

from segtran_tpu.kernels.squeezed_attention import cross_attention_reference
from segtran_tpu.parallel.context_parallel import (
    sharded_cross_attention, token_sharded_expand_attention)
from segtran_tpu.parallel.mesh import make_mesh


def test_sharded_squeeze_attention_exact():
    mesh = make_mesh(8, axes=("data", "model"), shape=(1, 8))
    rng = np.random.RandomState(0)
    g, a, n, d, f = 2, 16, 64, 32, 48   # n sharded 8-way
    q = jnp.asarray(rng.randn(g, a, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(g, n, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(g, n, f).astype(np.float32))
    out = jax.jit(lambda q, k, v: sharded_cross_attention(
        q, k, v, mesh=mesh, axis="model"))(q, k, v)
    ref = cross_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_token_sharded_expand_exact():
    mesh = make_mesh(8, axes=("data", "model"), shape=(1, 8))
    rng = np.random.RandomState(1)
    g, n, a, d, f = 2, 64, 16, 32, 48   # n (queries) sharded
    q = jnp.asarray(rng.randn(g, n, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(g, a, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(g, a, f).astype(np.float32))
    out = jax.jit(lambda q, k, v: token_sharded_expand_attention(
        q, k, v, mesh=mesh, axis="model"))(q, k, v)
    ref = cross_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multihost_helper_single_host():
    from segtran_tpu.parallel.multihost import init_multihost, is_master
    info = init_multihost()
    assert info["process_count"] == 1
    assert is_master()

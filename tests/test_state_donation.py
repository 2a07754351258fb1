"""create_train_state de-aliasing regression (ADVICE r4).

The in-jit `jnp.array(copy=True)` leaves in create_train_state are identical
instructions that HLO CSE could in principle merge on a future JAX/XLA
version; if two state leaves ever share one buffer again, donating the state
fails with "attempt to donate the same buffer twice" at the first train step
on TPU. Pin the contract here so an upgrade fails loudly in CI instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from segtran_tpu.train.trainer import create_train_state


def _make_state():
    # params deliberately include identical constants (two zeros leaves) and
    # an optimizer whose init produces all-zero moments -- the worst case for
    # constant caching / CSE-induced aliasing
    params = {"a": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
              "b": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.adam(1e-3)
    return create_train_state(params, {"bn": {"mean": jnp.zeros((4,))}},
                              tx, jax.random.PRNGKey(0)), tx


def test_state_leaves_have_unique_buffers():
    state, _ = _make_state()
    ptrs = [l.unsafe_buffer_pointer()
            for l in jax.tree_util.tree_leaves(state)]
    assert len(ptrs) == len(set(ptrs)), (
        "train-state leaves share device buffers; donation will fail")


def test_state_survives_donated_jit():
    state, tx = _make_state()

    @jax.jit
    def bump(s):
        grads = jax.tree_util.tree_map(jnp.ones_like, s.params)
        updates, opt_state = tx.update(grads, s.opt_state, s.params)
        return s.replace(step=s.step + 1,
                         params=optax.apply_updates(s.params, updates),
                         opt_state=opt_state)

    donated = jax.jit(bump, donate_argnums=(0,))
    out = donated(state)            # raises if any two leaves alias
    assert int(out.step) == 1
    np.testing.assert_array_less(np.asarray(out.params["a"]["kernel"]), 0)

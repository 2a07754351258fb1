"""BertAdam optax implementation vs the reference optimizer (oracle)."""
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
import optax  # noqa: E402

from segtran_tpu.train.bertadam import bert_adam, warmup_linear_schedule  # noqa: E402


def test_bertadam_matches_reference():
    from optimization import BertAdam

    rng = np.random.RandomState(0)
    w0 = rng.randn(8, 4).astype(np.float32)
    steps = 7
    grads = [rng.randn(8, 4).astype(np.float32) * (3.0 if i == 2 else 0.01)
             for i in range(steps)]

    # reference
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = BertAdam([p], lr=2e-4, warmup=0.2, t_total=10,
                   weight_decay=1e-4, max_grad_norm=0.05)
    for g in grads:
        p.grad = torch.tensor(g.copy())
        opt.step()
    ref_w = p.detach().numpy()

    # ours
    tx = bert_adam(lr=2e-4, warmup=0.2, t_total=10, weight_decay=1e-4,
                   max_grad_norm=0.05)
    params = jnp.asarray(w0.copy())
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params), ref_w, rtol=1e-5, atol=1e-7)


def test_warmup_linear_schedule():
    sched = warmup_linear_schedule(1.0, 0.1, 100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(55)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-6)
    # beyond t_total lr stays 0 (reference warmup_linear max(..., 0))
    assert float(sched(150)) == 0.0

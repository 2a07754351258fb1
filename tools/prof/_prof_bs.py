"""Throughput vs batch size for the flagship fundus forward."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))  # repo root
import time

import jax
import jax.numpy as jnp

from segtran_tpu.utils.cache import enable_compilation_cache
from segtran_tpu.configs import Segtran2dConfig
from segtran_tpu.models import Segtran2d
from segtran_tpu.nn.init import init_with_reference_schemes

enable_compilation_cache()

cfg = Segtran2dConfig(
    backbone_type="eff-b4", num_classes=3,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    dtype=jnp.bfloat16,
).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
model = Segtran2d(cfg)
params, rest = init_with_reference_schemes(
    model, {"params": jax.random.PRNGKey(0)},
    jnp.zeros((1, 288, 288, 3), jnp.float32))
variables = {"params": params, **rest}
full = jax.jit(lambda v, xi: model.apply(v, xi, train=False))

for B in (16, 32, 48, 64, 96):
    x = jnp.zeros((B, 288, 288, 3), jnp.float32)
    out = full(variables, x)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(full(variables, x))
    t0 = time.perf_counter()
    iters = 15
    for _ in range(iters):
        out = full(variables, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"bs{B}: {dt*1e3:.1f} ms  {B/dt:.1f} imgs/s", flush=True)

"""Encoder-only probe: fused Pallas attention vs XLA path at the 2D flagship
shapes (B=64, N=1296 tokens, dims 1792/1792/896/448, A=256, M=4, bf16).

Encoder-only so the remote compile stays ~1 min per variant (full bs-64 model
compiles blew a 10-min budget through the tunnel).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))  # repo root
import sys
import time

import jax
import jax.numpy as jnp

from segtran_tpu.utils.cache import enable_compilation_cache
from segtran_tpu.configs import Segtran2dConfig
from segtran_tpu.nn.encoder import SegtranFusionEncoder
from segtran_tpu.nn.poscode import gen_all_indices

enable_compilation_cache()
B = 64
H2 = W2 = 36
N = H2 * W2


def timeit(fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def costs(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return ca.get("flops", 0) / 1e12, ca.get("bytes accessed", 0) / 1e9


vfeat = jax.random.normal(jax.random.PRNGKey(0), (B, N, 1792),
                          jnp.float32) * 0.3
vmask = jnp.ones((B, N, 1), jnp.float32)
voxels_pos = jnp.tile(
    gen_all_indices((H2, W2)).reshape(1, N, 2).astype(jnp.float32), (B, 1, 1))

for fused in ([False, True] if len(sys.argv) < 2
              else [sys.argv[1] == "fused"]):
    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        use_fused_attention=fused, dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    enc = SegtranFusionEncoder(cfg)
    variables = jax.jit(lambda r: enc.init(
        r, vfeat[:1], voxels_pos[:1], vmask[:1], (H2, W2),
        deterministic=True))(jax.random.PRNGKey(1))
    f = jax.jit(lambda v, x, p, m: enc.apply(v, x, p, m, (H2, W2),
                                             deterministic=True))
    dt = timeit(f, variables, vfeat, voxels_pos, vmask)
    print(f"fused={fused}: {dt*1e3:.1f} ms  {B/dt:.0f} enc-imgs/s",
          flush=True)

"""Fused-eval MBConv backbone vs unfused, real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))  # repo root
import time

import jax
import jax.numpy as jnp

from segtran_tpu.utils.cache import enable_compilation_cache
from segtran_tpu.nn.backbones.efficientnet import EfficientNetFeatures

enable_compilation_cache()
B = 32


def timeit(fn, v, x, iters=24):
    """Chained-readback slope timing (TODO.md: block_until_ready does not
    synchronize small executables through the axon tunnel)."""
    def chain(n):
        xi = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(v, xi)
            # data dependency: feed a scalar of the output back into x
            xi = x + out[0][0, 0, 0, 0].astype(x.dtype)
        float(jnp.sum(out[-1][0, 0, 0]))
        return time.perf_counter() - t0
    chain(1); chain(1)
    t1 = chain(1)
    tk = chain(iters)
    return (tk - t1) / (iters - 1)


x = jnp.zeros((B, 288, 288, 3), jnp.bfloat16)
base = EfficientNetFeatures(variant="eff-b4", stem_stride=1,
                            dtype=jnp.bfloat16)
v = base.init({"params": jax.random.PRNGKey(0)}, x[:1], False)

f0 = jax.jit(lambda v, xi: base.apply(v, xi, False))
dt0 = timeit(f0, v, x)
print(f"unfused backbone: {dt0*1e3:.1f} ms", flush=True)

fused = EfficientNetFeatures(variant="eff-b4", stem_stride=1,
                             fused_eval=True, dtype=jnp.bfloat16)
f1 = jax.jit(lambda v, xi: fused.apply(v, xi, False))
dt1 = timeit(f1, v, x)
print(f"fused backbone:   {dt1*1e3:.1f} ms ({dt0/dt1:.2f}x)", flush=True)

comp = jax.jit(lambda v, xi: fused.apply(v, xi, False)).lower(v, x).compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
print(f"fused bytes: {ca.get('bytes accessed', 0)/1e9:.1f} GB "
      f"flops {ca.get('flops', 0)/1e12:.2f} T", flush=True)

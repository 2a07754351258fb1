"""Per-block mbconv_front vs XLA chain, real chip, slope timing."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))  # repo root
import time
import functools

import jax
import jax.numpy as jnp

from segtran_tpu.utils.cache import enable_compilation_cache
from segtran_tpu.kernels.mbconv import mbconv_front
from segtran_tpu.nn.backbones.efficientnet import build_block_specs

enable_compilation_cache()
B = 32
blocks, ep, stem_f, head_f, stem_pad = build_block_specs("eff-b4", 1)

# (spec index, input H=W) for distinct stride-1 shapes in the 288^2 chain
sizes = {}
size = 288
reps = []
for i, s in enumerate(blocks):
    if s.stride == 2:
        size //= 2
    key = (s.kernel, s.expand_ratio, s.in_filters, s.out_filters, size,
           s.stride)
    if s.stride == 1 and key not in sizes:
        sizes[key] = (i, size)
reps = list(sizes.values())


def slope(f, x, iters=8):
    def chain(n):
        xi = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(xi)
            xi = x + out[0, 0, 0, 0].astype(x.dtype)
        float(jnp.sum(out[0, 0]))
        return time.perf_counter() - t0
    chain(1); chain(1)
    t1 = chain(1)
    tk = chain(iters)
    return (tk - t1) / (iters - 1)


for i, size in reps:
    s = blocks[i]
    cexp = s.in_filters * s.expand_ratio
    key = jax.random.PRNGKey(i)
    x = jax.random.normal(key, (B, size, size, s.in_filters),
                          jnp.bfloat16) * 0.1
    w_exp = (jax.random.normal(key, (s.in_filters, cexp), jnp.bfloat16) * 0.1
             if s.expand_ratio != 1 else None)
    s0 = jnp.ones((cexp,), jnp.float32)
    b0 = jnp.zeros((cexp,), jnp.float32)
    w_dw = jax.random.normal(key, (s.kernel, s.kernel, cexp),
                             jnp.bfloat16) * 0.1
    s1 = jnp.ones((cexp,), jnp.float32)
    b1 = jnp.zeros((cexp,), jnp.float32)
    pad = s.pad

    @jax.jit
    def fused(xi, w_exp=w_exp, s0=s0, b0=b0, w_dw=w_dw, s1=s1, b1=b1,
              spec=s, pad=pad):
        dw, se = mbconv_front(xi, w_exp, s0, b0, w_dw, s1, b1,
                              kernel=spec.kernel, stride=spec.stride,
                              pad=pad)
        return dw + se[:, None, None, :].astype(dw.dtype)

    @jax.jit
    def xla(xi, w_exp=w_exp, w_dw=w_dw, spec=s, pad=pad):
        e = xi
        if w_exp is not None:
            e = jnp.einsum("bhwc,cd->bhwd", xi, w_exp)
            e = e * jax.nn.sigmoid(e)
        e = jnp.pad(e, ((0, 0), pad[0], pad[1], (0, 0)))
        dw = jax.lax.conv_general_dilated(
            e, w_dw[:, :, None, :], (spec.stride,) * 2, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=e.shape[-1])
        dw = dw * jax.nn.sigmoid(dw)
        se = jnp.mean(dw, axis=(1, 2))
        return dw + se[:, None, None, :].astype(dw.dtype)

    tf = slope(fused, x)
    tx = slope(xla, x)
    print(f"blk{i:2d} {size}^2 cin{s.in_filters:4d} cexp{cexp:4d} "
          f"k{s.kernel}: fused {tf*1e3:7.2f} ms  xla {tx*1e3:7.2f} ms  "
          f"({tx/tf:.2f}x)", flush=True)

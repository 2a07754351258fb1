"""On-chip A/B of the round-3 encoder fast paths on the flagship fundus
forward: baseline vs fused epilogue vs fused attention vs both.

Plain-loop timing with trailing block_until_ready (valid: workloads >> the
~30 ms D2H floor, see TODO.md round-2 methodology note).
"""
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
B = 64


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build(**kw):
    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.bfloat16, **kw,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    return Segtran2d(cfg)


x = jnp.zeros((B, 288, 288, 3), jnp.float32)
base = build()
params, rest = init_with_reference_schemes(
    base, {"params": jax.random.PRNGKey(0)}, x[:1])
variables = {"params": params, **rest}

variants = {
    # bench-deciding pair first (fresh remote compiles are ~2-4 min each)
    "baseline": build(),
    "epilogue": build(use_fused_epilogue=True),
    "noreassoc": build(reassociate=False),
    "fusedattn": build(use_fused_attention=True),
    "both": build(use_fused_attention=True, use_fused_epilogue=True),
}
outs = {}
for name, model in variants.items():
    fwd = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False))
    dt = timeit(fwd, variables, x)
    outs[name] = jnp.mean(fwd(variables, x).astype(jnp.float32))
    print(f"{name:10s}: {dt*1e3:7.2f} ms  -> {B/dt:7.1f} imgs/s", flush=True)
for name, o in outs.items():
    d = abs(float(o) - float(outs["baseline"]))
    print(f"{name:10s} mean-logit |delta| vs baseline: {d:.3e}")

# ---- 3D: BraTS whole-volume (bench.py config), epilogue on/off ----------
from segtran_tpu.configs import Segtran3dConfig
from segtran_tpu.models.segtran3d import Segtran3d

VOL = (160, 192, 144)


def build3d(**kw):
    return Segtran3d(Segtran3dConfig(
        num_classes=4, num_attractors=1024, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.bfloat16, **kw,
    ).derive(translayer_compress_ratios=(1.0, 1.0)))


x3 = jnp.zeros((1, *VOL, 4), jnp.float32)
m3 = build3d()
p3, r3 = init_with_reference_schemes(
    m3, {"params": jax.random.PRNGKey(0)}, x3)
v3 = {"params": p3, **r3}
outs3 = {}
for name, model in {
        "3d-xla": build3d(),
        "3d-fusedattn": build3d(use_fused_attention=True),
        "3d-fused+epi": build3d(use_fused_attention=True,
                                use_fused_epilogue=True)}.items():
    fwd = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False))
    dt = timeit(fwd, v3, x3, iters=10)
    outs3[name] = jnp.mean(fwd(v3, x3).astype(jnp.float32))
    mvox = VOL[0] * VOL[1] * VOL[2] / dt / 1e6
    print(f"{name:12s}: {dt*1e3:7.2f} ms  -> {mvox:6.1f} Mvox/s", flush=True)
print("3d mean-logit |delta| vs 3d-xla:",
      {n: abs(float(o) - float(outs3["3d-xla"])) for n, o in outs3.items()})

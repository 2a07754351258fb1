"""On-chip tile sweep for the fused flash attention at the BraTS wholevol
shape (VERDICT r3 weak #6 / TODO 'tune fused-kernel tiles for bf16 + very
large N'): run the FULL wholevol forward (the bench-deciding workload) with
use_fused_attention=True under different SEGTRAN_FLASH_TILE_Q/N settings and
compare against the XLA path.

Plain-loop timing with trailing block_until_ready (valid: whole-volume
forward >> the ~30 ms D2H floor, TODO.md round-2 methodology note).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))  # repo root
import os
import sys
import time

import jax
import jax.numpy as jnp

from segtran_tpu.utils.cache import enable_compilation_cache
from segtran_tpu.configs import Segtran3dConfig
from segtran_tpu.models.segtran3d import Segtran3d
from segtran_tpu.nn.init import init_with_reference_schemes

enable_compilation_cache()
VOL_SHAPE = (160, 192, 144)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build(fused):
    cfg = Segtran3dConfig(
        num_classes=4, num_attractors=1024, orig_in_channels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        use_fused_attention=fused, dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0))
    return Segtran3d(cfg)


# print the attention shapes the kernel actually sees (once)
import segtran_tpu.kernels.squeezed_attention as sq
_orig = sq.fused_cross_attention_trainable
_seen = set()


def _traced(q, k, v, *a, **kw):
    key = (q.shape, k.shape, v.shape)
    if key not in _seen:
        _seen.add(key)
        print(f"[shapes] q={q.shape} k={k.shape} v={v.shape}", flush=True)
    return _orig(q, k, v, *a, **kw)


# attention.py imports the symbol inside __call__ (at trace time), so the
# module-attribute patch is picked up.
sq.fused_cross_attention_trainable = _traced

x = jnp.zeros((1, *VOL_SHAPE, 4), jnp.float32)
base = build(False)
params, rest = init_with_reference_schemes(
    base, {"params": jax.random.PRNGKey(0)}, x)
variables = {"params": params, **rest}

vox = VOL_SHAPE[0] * VOL_SHAPE[1] * VOL_SHAPE[2]

settings = [("xla", None, None)]
for tq, tn in [(1024, 1024), (1024, 512), (512, 1024), (2048, 512),
               (512, 512), (256, 1024)]:
    settings.append((f"flash q{tq} n{tn}", tq, tn))

only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, tq, tn in settings:
    if only and not any(o in name for o in only):
        continue
    if tq is None:
        model = build(False)
        os.environ.pop("SEGTRAN_FLASH_TILE_Q", None)
        os.environ.pop("SEGTRAN_FLASH_TILE_N", None)
    else:
        model = build(True)
        os.environ["SEGTRAN_FLASH_TILE_Q"] = str(tq)
        os.environ["SEGTRAN_FLASH_TILE_N"] = str(tn)

    @jax.jit
    def fwd(variables, x, model=model):
        return model.apply(variables, x, train=False)

    try:
        dt = timeit(fwd, variables, x)
    except Exception as e:   # e.g. scoped-VMEM OOM at oversized tiles
        print(f"{name:20s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        jax.clear_caches()
        continue
    print(f"{name:20s} {dt*1e3:8.2f} ms  {vox/dt/1e6:7.2f} Mvox/s", flush=True)
    jax.clear_caches()

"""Train-step batch-size sweep (VERDICT r4 next #3): does a larger --bs
sidestep XLA's small-batch conv spatial blocking (the ~85 GB of backward
copy traffic left after remat_blocks, TODO.md round-4 profile)?

Sweeps bs x remat_blocks on the bench recipe (fundus eff-b4 288^2 bf16,
full fwd+loss+bwd+BertAdam update) and prints TFLOP / HBM GB / ms / imgs/s
per point. Steady-state only — uses the persistent compilation cache; for
compile-latency numbers see _prof_compile.py.
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
from segtran_tpu.models import Segtran2d
from segtran_tpu.nn.init import init_with_reference_schemes
from segtran_tpu.train.trainer import (build_optimizer, make_loss_fn,
                                       make_train_step, create_train_state)

enable_compilation_cache()
SIZES = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                          else ("6", "12", "24", "48"))]
REMATS = [True, False]


def costs(comp):
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return ca.get("flops", 0) / 1e12, ca.get("bytes accessed", 0) / 1e9


def chain_time(fn, state, batch, iters=10):
    state = fn(state, batch)[0]
    jax.block_until_ready(state.step)
    state = fn(state, batch)[0]
    jax.block_until_ready(state.step)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = fn(state, batch)
    jax.block_until_ready(state.step)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"bs sweep {SIZES} x remat_blocks {REMATS}", flush=True)
    for remat in REMATS:
        cfg = Segtran2dConfig(
            backbone_type="eff-b4", num_classes=3, dtype=jnp.bfloat16,
            remat_blocks=remat,
        ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
        model = Segtran2d(cfg)
        params, rest = init_with_reference_schemes(
            model, {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 288, 288, 3), jnp.float32))
        tx = build_optimizer()
        loss_fn = make_loss_fn(cfg.num_classes, (0.0, 1.0, 2.0))
        state0 = create_train_state(params, rest.get("batch_stats", {}), tx,
                                    jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(model, tx, loss_fn))
        for bs in SIZES:
            batch = {"image": jnp.zeros((bs, 288, 288, 3), jnp.float32),
                     "mask": jnp.zeros((bs, 288, 288, 3), jnp.float32)}
            try:
                comp = step.lower(state0, batch).compile()
                tf, gb = costs(comp)
                # time the AOT executable itself -- calling the jit wrapper
                # would trace+compile the same graph a second time
                dt = chain_time(comp, state0, batch)
            except Exception as e:  # OOM at large bs is a datapoint too
                print(f"remat={int(remat)} bs={bs:3d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            print(f"remat={int(remat)} bs={bs:3d}: {tf:6.2f} TFLOP "
                  f"{gb:6.1f} GB  {dt*1e3:7.1f} ms  {bs/dt:6.1f} imgs/s "
                  f"({gb/dt:4.0f} GB/s, {tf/dt:3.0f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()

"""Train-step breakdown at the bench recipe (fundus eff-b4 288^2 bs 6 bf16):
cost analysis (FLOPs / HBM bytes) + chained-step timing for
  (a) the full update (fwd+loss+bwd+BertAdam)  -- what bench.py measures
  (b) value_and_grad only (no optimizer)
  (c) forward+loss only
and optionally a remat variant (arg: 'remat') that checkpoints each translayer
to see whether trading FLOPs for saved-activation HBM wins on the v5e.
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
BS = 6


def chain_time(fn, state, batch, iters=12):
    t0 = time.perf_counter()
    state = fn(state, batch)[0]
    jax.block_until_ready(state.step)
    print(f"  compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    state = fn(state, batch)[0]
    jax.block_until_ready(state.step)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = fn(state, batch)
    jax.block_until_ready(state.step)
    return (time.perf_counter() - t0) / iters


def costs(comp):
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return ca.get("flops", 0) / 1e12, ca.get("bytes accessed", 0) / 1e9


def main():
    cfg = Segtran2dConfig(
        backbone_type="eff-b4", num_classes=3, dtype=jnp.bfloat16,
    ).derive(translayer_compress_ratios=(1.0, 1.0, 2.0, 2.0))
    model = Segtran2d(cfg)
    x = jnp.zeros((BS, 288, 288, 3), jnp.float32)
    mask = jnp.zeros((BS, 288, 288, 3), jnp.float32)
    print(f"[prof] init... ({time.strftime('%H:%M:%S')})", flush=True)
    params, rest = init_with_reference_schemes(
        model, {"params": jax.random.PRNGKey(0)}, x[:1])
    tx = build_optimizer()
    loss_fn = make_loss_fn(cfg.num_classes, (0.0, 1.0, 2.0))
    state = create_train_state(params, rest.get("batch_stats", {}), tx,
                               jax.random.PRNGKey(1))
    batch = {"image": x, "mask": mask}

    step = jax.jit(make_train_step(model, tx, loss_fn))
    comp = step.lower(state, batch).compile()
    tf, gb = costs(comp)
    print(f"full step: {tf:.2f} TFLOP, {gb:.1f} GB", flush=True)
    dt = chain_time(step, state, batch)
    print(f"full step: {dt*1e3:.1f} ms = {1/dt:.2f} steps/s "
          f"({tf/dt:.0f} TFLOP/s, {gb/dt:.0f} GB/s)", flush=True)

    # grad-only (no optimizer/BN-state plumbing differences matter here)
    def grad_only(state, batch):
        def lf(p):
            logits, st = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["image"], train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            return loss_fn(logits, batch["mask"])[0], st
        (l, _), g = jax.value_and_grad(lf, has_aux=True)(state.params)
        return state.replace(step=state.step + jnp.int32(l * 0 + 1)), g

    gstep = jax.jit(grad_only)
    comp = gstep.lower(state, batch).compile()
    tf2, gb2 = costs(comp)
    dt2 = chain_time(gstep, state, batch)
    print(f"grad only: {tf2:.2f} TFLOP, {gb2:.1f} GB; {dt2*1e3:.1f} ms "
          f"-> optimizer adds {(dt-dt2)*1e3:.1f} ms", flush=True)

    # forward+loss only
    def fwd_only(state, batch):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        l = loss_fn(logits, batch["mask"])[0]
        return state.replace(step=state.step + jnp.int32(l * 0 + 1)), l

    fstep = jax.jit(fwd_only)
    comp = fstep.lower(state, batch).compile()
    tf3, gb3 = costs(comp)
    dt3 = chain_time(fstep, state, batch)
    print(f"fwd+loss:  {tf3:.2f} TFLOP, {gb3:.1f} GB; {dt3*1e3:.1f} ms "
          f"-> backward adds {(dt2-dt3)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

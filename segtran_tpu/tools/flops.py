"""Param / FLOP counting and throughput measurement.

Replaces the reference's thop/fvcore profiling (reference
train2d.py:1048-1062 --profile, test2d.py:623-631 --flop): FLOPs come from
XLA's own cost analysis of the compiled executable (exact for the lowered
program, unlike op-counting estimators), and FPS uses the same timed-loop
protocol as the reference's 20-batch loop.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def estimate_flops(fn: Callable, *args) -> Dict[str, float]:
    """Compile fn and read XLA's cost analysis. Returns {'flops', 'bytes'}."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {"flops": float(ca.get("flops", -1.0)),
            "bytes": float(ca.get("bytes accessed", -1.0))}


def measure_fps(fn: Callable, *args, iters: int = 20,
                warmup: int = 3) -> float:
    """Timed throughput: returns calls/sec (multiply by batch for imgs/sec).
    Mirrors the reference's FPS loop (train2d.py:1055-1061)."""
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)


def profile_trace(log_dir: str):
    """jax.profiler trace context (the reference has no timeline tracing;
    this exposes TPU profiles viewable in TensorBoard/XProf)."""
    return jax.profiler.trace(log_dir)

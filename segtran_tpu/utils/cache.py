"""Persistent XLA compilation cache.

Big jitted graphs (train step of eff-b4 Segtran2d) take minutes to compile
through the remote-compile tunnel; the persistent cache makes recompiles
across processes instant. Called by every CLI and bench.py.
"""
from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None):
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/segtran_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001  (older jax or read-only fs: best effort)
        pass
    return path

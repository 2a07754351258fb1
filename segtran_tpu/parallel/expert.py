"""Expert parallelism over Segtran's attention modes.

Segtran's "experts" are its num_modes parallel attention/FFN branches: the
private per-mode weights (MMPrivateLinear [M, F, F] kernels,
nn/attention.py:113-131) compute independent per-mode features that a
LearnedSoftAggregate (:93-110) then softmax-pools over the mode axis. The
reference evaluates all modes on every GPU; on a TPU mesh the mode axis can
shard over devices so each chip holds and computes only its own experts --
zero communication through the whole private path, and exactly ONE
psum+pmax pair at the aggregation (the softmax over modes is distributed
like a context-parallel softmax).

``mode_sharded_ffn_aggregate`` is the shard_map primitive (exact math,
oracle-tested vs MMPrivateMid + LearnedSoftAggregate); GSPMD-driven EP for
the full training step comes from ``leaf_sharding_rule(expert_dim_size=M)``
in tensor_parallel.py (train2d --tp N --ep).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.5
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def mode_sharded_ffn_aggregate(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, score_kernel: jnp.ndarray,
                               score_bias: jnp.ndarray, mesh: Mesh,
                               axis: str = "model") -> jnp.ndarray:
    """softmax-aggregate(private_ffn(x)) with the mode axis sharded.

    x: [B, M, U, F] per-mode features (M sharded over `axis`);
    kernel/bias: MMPrivateLinear params [M, F, F] / [M, F] (M sharded);
    score_kernel/score_bias: the aggregate's feat2score Dense [F, 1] / [1]
    (replicated). Returns [B, U, F] replicated -- identical math to
    MMPrivateMid + LearnedSoftAggregate(group_dim=1) in eval mode.
    """
    def local(xb, kb, bb, sw, sb):
        y = jnp.einsum("bmuf,mfg->bmug", xb, kb,
                       preferred_element_type=xb.dtype)
        y = _gelu_exact(y + bb[None, :, None, :])
        scores = jnp.einsum("bmuf,fo->bmuo", y, sw) + sb
        # distributed softmax over the (sharded) mode axis
        gmax = jax.lax.pmax(jnp.max(scores, axis=1, keepdims=True), axis)
        p = jnp.exp(scores - gmax)
        denom = jax.lax.psum(jnp.sum(p, axis=1, keepdims=True), axis)
        part = jnp.sum(y * (p / denom), axis=1)
        return jax.lax.psum(part, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(axis), P(), P()),
        out_specs=P())(x, kernel, bias, score_kernel, score_bias)

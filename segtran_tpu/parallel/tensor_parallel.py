"""Tensor-parallel (2D mesh) training via GSPMD weight sharding.

The reference has no model parallelism at all (DDP only, reference
train2d.py:796-801); the fusion transformer's widest layers (1792-dim
expansion FFNs, 4-mode einsum kernels) replicate on every GPU. On a TPU mesh
the idiomatic upgrade is Megatron-style weight sharding expressed as GSPMD
annotations: shard every large kernel's widest divisible dimension over the
'model' axis at the jit boundary and let XLA place the matching collectives
(all-gather / reduce-scatter) on ICI. Because BertAdam's moments mirror the
param shapes, one shape-based rule tree-mapped over the whole TrainState
shards params AND optimizer state consistently -- per-chip memory for the
big layers drops by the model-axis size.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_sharding_rule(mesh: Mesh, axis: str = "model",
                       min_size: int = 1 << 16,
                       expert_dim_size: int | None = None):
    """Shape-based rule: leaves with >= min_size elements get their widest
    mesh-divisible dimension sharded over `axis`; everything else (biases,
    norm scales, scalars, small kernels) is replicated.

    expert_dim_size: expert-parallel preference (Segtran's per-mode private
    weights are its experts -- MMPrivateLinear kernels [M, F, F] / biases
    [M, F], nn/attention.py:113-131). Leaves whose LEADING dim equals it get
    that dim sharded first, so each device holds whole experts and GSPMD
    propagates the mode sharding through the per-mode einsums with no
    weight-side collectives until the learned mode aggregation."""
    m = mesh.shape[axis]

    def rule(x) -> NamedSharding:
        shape = tuple(getattr(x, "shape", ()))
        size = 1
        for s in shape:
            size *= s
        if (m > 1 and expert_dim_size and len(shape) >= 2
                and shape[0] == expert_dim_size and shape[0] % m == 0):
            return NamedSharding(mesh, P(*([axis] + [None] * (len(shape) - 1))))
        if m > 1 and len(shape) >= 2 and size >= min_size:
            order = sorted(range(len(shape)), key=lambda d: -shape[d])
            for d in order:
                if shape[d] % m == 0 and shape[d] >= m:
                    spec = [None] * len(shape)
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def state_sharding_spec(state: Any, mesh: Mesh, axis: str = "model",
                        min_size: int = 1 << 16,
                        expert_dim_size: int | None = None) -> Any:
    """Sharding pytree for a TrainState (params, batch_stats, opt_state, rng,
    step) under the shape-based weight-sharding rule."""
    return jax.tree_util.tree_map(
        leaf_sharding_rule(mesh, axis, min_size, expert_dim_size), state)


def shard_train_step_2d(train_step, mesh: Mesh, state_shardings,
                        data_axis: str = "data", donate_state: bool = True):
    """jit the step on a (data x model) mesh: batch sharded over `data_axis`,
    weights/moments sharded per `state_shardings`, metrics replicated."""
    batch_sharded = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_sharded),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,) if donate_state else ())


def shard_state_to_mesh(state: Any, mesh: Mesh, axis: str = "model",
                        min_size: int = 1 << 16,
                        expert_dim_size: int | None = None):
    """device_put a host/replicated TrainState into its 2D-mesh layout;
    returns (sharded_state, sharding_spec)."""
    spec = state_sharding_spec(state, mesh, axis, min_size, expert_dim_size)
    return jax.device_put(state, spec), spec

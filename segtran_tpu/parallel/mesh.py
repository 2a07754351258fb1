"""Device mesh + sharding helpers.

The reference's entire distributed stack (NCCL process group, DDP gradient
all-reduce, SyncBatchNorm, DistributedSampler, manual reduce_tensor --
reference train2d.py:796-801, 1108-1113, 443-447, 860-867) collapses into:
make a Mesh, shard the batch on the 'data' axis, jit the step. XLA GSPMD
inserts the gradient reductions over ICI; batch statistics (BN, global-batch
dice) are global by construction because the computation is written on the
global view.

A 'model' axis is reserved for tensor/sequence sharding of the fusion
transformer (attractor cross-attention is exactly shardable over tokens: the
squeeze step's softmax is over tokens, so token-sharded QK + psum of the
attractor updates reproduces the full computation -- see
kernels/squeezed_attention.py for the fused path).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_to_mesh(batch, mesh: Mesh, axis: str = "data"):
    """Shard each leaf's leading (batch) dim over the data axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def shard_train_step(train_step, mesh: Mesh, data_axis: str = "data",
                     donate_state: bool = True):
    """jit the step with params replicated and the batch sharded on the data
    axis -- the TPU-native replacement for DDP."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate_state else (),
    )

"""Worker for the 2-process jax.distributed smoke test (not a test module).

Run as:  python tests/_multihost_worker.py <port> <rank> <nprocs> <out.json>

Forces the CPU platform (the container's sitecustomize registers the
single-tenant axon TPU; two processes grabbing it would stall each other),
initializes cross-process JAX through parallel.multihost.init_multihost, and
runs ONE data-parallel train step of a tiny flax model over the global mesh:
the batch is process-local (jax.make_array_from_process_local_data), the
gradient reduction is the psum GSPMD inserts for the replicated-param /
data-sharded-batch jit. Writes topology + post-step param checksum to
out.json so the parent can assert both ranks saw 4 devices and computed
IDENTICAL updates (i.e. the cross-process gradient all-reduce really ran).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.relu(x)
        return nn.Conv(2, (1, 1))(x)


def main():
    port, rank, nprocs, out_path = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4])
    from segtran_tpu.parallel.multihost import init_multihost, is_master
    info = init_multihost(coordinator_address=f"localhost:{port}",
                          num_processes=nprocs, process_id=rank)
    assert info["process_count"] == nprocs, info

    from segtran_tpu.train.trainer import (build_optimizer, create_train_state,
                                           make_loss_fn, make_train_step)

    model = TinyNet()
    rng = jax.random.PRNGKey(0)               # same init on every process
    local_bs, H = 2, 16
    params = model.init({"params": rng}, jnp.zeros((1, H, H, 3)))["params"]
    tx = build_optimizer(t_total=10)
    loss_fn = make_loss_fn(2, (0.0, 1.0))
    state = create_train_state(params, {}, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, loss_fn, has_batch_stats=False)

    devices = np.asarray(jax.devices()).reshape(-1)
    mesh = Mesh(devices, ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    # DIFFERENT per-rank data: only a real cross-process gradient reduction
    # makes the resulting params agree.
    np_rng = np.random.RandomState(100 + rank)
    img_local = np_rng.rand(local_bs, H, H, 3).astype(np.float32)
    mask_local = np.zeros((local_bs, H, H, 2), np.float32)
    mask_local[..., 1] = (np_rng.rand(local_bs, H, H) > 0.5)
    mask_local[..., 0] = 1.0 - mask_local[..., 1]
    gshape = (local_bs * nprocs, H, H, 2)
    batch = {
        "image": jax.make_array_from_process_local_data(
            shard, img_local, (local_bs * nprocs, H, H, 3)),
        "mask": jax.make_array_from_process_local_data(
            shard, mask_local, gshape),
    }
    state = jax.device_put(state, repl)
    jit_step = jax.jit(step, in_shardings=(repl, shard),
                       out_shardings=(repl, repl))
    state, metrics = jit_step(state, batch)
    loss = float(metrics["loss"])
    checksum = float(sum(jnp.sum(jnp.abs(x)) for x in
                         jax.tree_util.tree_leaves(state.params)))
    with open(out_path, "w") as f:
        json.dump({"rank": rank, "is_master": bool(is_master()),
                   "process_count": info["process_count"],
                   "global_devices": info["global_devices"],
                   "local_devices": info["local_devices"],
                   "loss": loss, "param_checksum": checksum}, f)


if __name__ == "__main__":
    main()

"""Multi-host initialization.

Replaces the reference's NCCL process-group setup (reference
train2d.py:796-801: dist.init_process_group('nccl', init_method='env://') with
rank from --local_rank / WORLD_SIZE): one jax.distributed.initialize() call
reads the TPU runtime's coordinator env (or explicit arguments), after which
jax.devices() spans all hosts and the same Mesh/pjit code scales across
slices; intra-slice collectives ride ICI, inter-slice DCN.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   verbose: bool = False) -> dict:
    """Initialize cross-host JAX if a multi-process environment is detected.
    Safe to call on a single host (no-op). Returns topology info; with
    ``verbose`` prints the rank/topology line the train CLIs show."""
    env_addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if env_addr and env_n > 1:
        jax.distributed.initialize(
            coordinator_address=env_addr,
            num_processes=env_n,
            process_id=process_id if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")))
    topo = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    if verbose and topo["process_count"] > 1:
        print(f"multi-host: rank {topo['process_index']}/"
              f"{topo['process_count']}, {topo['local_devices']} local / "
              f"{topo['global_devices']} global devices")
    return topo


def is_master() -> bool:
    """Rank-0 gating for checkpoints/logging (reference print0/is_master,
    train2d.py:52-54, 641)."""
    return jax.process_index() == 0

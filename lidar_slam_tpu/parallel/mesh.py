"""Device-mesh helpers.

The multi-host execution model replacing the reference's multi-process ROS
graph (SURVEY.md §2.3): one program, SPMD over a `jax.sharding.Mesh`, with
reductions riding ICI collectives instead of TCPROS messages.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_distributed_initialized = False


def distributed_init_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry point: initialize `jax.distributed` over DCN.

    Replaces the reference's cross-machine story (it has none — ROS TCPROS is
    single-machine, SURVEY.md §5.8): on a multi-host TPU pod slice each host
    process calls this before any jax computation, then `make_mesh()` returns
    a mesh spanning every chip of every host and the shard_map/psum paths in
    this package (sharded_ndt, sharded_graph, sharded_schur, sharded map
    build) run unchanged with reductions riding ICI (and DCN where the mesh
    crosses hosts).

    Configuration comes from arguments or the standard environment:
      SLAM_COORDINATOR_ADDRESS  host:port of process 0
      SLAM_NUM_PROCESSES        world size
      SLAM_PROCESS_ID           this process's rank
    (On Cloud TPU / SLURM / Open MPI, `jax.distributed.initialize()` can
    auto-detect all three; we pass through whatever is given.)

    Returns True when distributed mode was initialized, False for the
    single-host no-op (no coordinator configured) — so callers and the
    driver's single-host dryrun are safe without any environment.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("SLAM_COORDINATOR_ADDRESS")
    env_np = os.environ.get("SLAM_NUM_PROCESSES")
    env_pid = os.environ.get("SLAM_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return False  # single-host: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    return True


def device_count() -> int:
    return len(jax.devices())


def process_count() -> int:
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n devices (default: all). The single axis
    shards points / edges / keyframes — the data-parallel dimension of every
    SLAM reduction in this package."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))

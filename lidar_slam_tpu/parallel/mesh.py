"""Device-mesh helpers.

The multi-host execution model replacing the reference's multi-process ROS
graph (SURVEY.md §2.3): one program, SPMD over a `jax.sharding.Mesh`, with
reductions riding ICI collectives instead of TCPROS messages.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n devices (default: all). The single axis
    shards points / edges / keyframes — the data-parallel dimension of every
    SLAM reduction in this package."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))

"""Motion-distortion removal for spinning-lidar sweeps.

Re-design of DistortionAdjust (src/models/scan_adjust/distortion_adjust.cpp:
10-69): given the sweep's angular velocity and linear velocity (already
lever-arm-transformed to the lidar frame), de-rotate/translate each point by
its intra-sweep timestamp inferred from azimuth.

NOTE the reference wires this up but leaves it DISABLED in the active
pipeline (data_pretreat_flow.cpp:268-270); it is likewise opt-in here
(DataPretreatConfig.adjust_distortion=False by default). The reference also
drops a 5 degree wedge at the scan seam; with per-point masks we keep all
points and simply clamp the time fraction instead.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..geom.se3 import so3_exp


@dataclasses.dataclass(frozen=True)
class DistortionConfig:
    scan_period: float = 0.1


@partial(jax.jit, static_argnames=("cfg",))
def adjust_cloud(points, mask, angular_vel, linear_vel, cfg: DistortionConfig = DistortionConfig()):
    """De-skew one sweep.

    Args:
      points: [N, 3] sensor-frame points of one sweep.
      angular_vel: [3] rad/s in the lidar frame.
      linear_vel: [3] m/s in the lidar frame.
    Returns:
      [N, 3] corrected points (all referenced to the sweep start).

    The per-point time is `scan_period * azimuth_fraction` measured from the
    first point's azimuth (the reference rotates the cloud to start at 0
    azimuth first, UpdateMatrix semantics, distortion_adjust.cpp:27-69).
    """
    start_azim = jnp.arctan2(points[0, 1], points[0, 0])
    azim = jnp.arctan2(points[:, 1], points[:, 0]) - start_azim
    azim = jnp.where(azim < 0, azim + 2 * jnp.pi, azim)
    frac = jnp.clip(azim / (2 * jnp.pi), 0.0, 1.0)
    t = frac * cfg.scan_period  # [N]

    # rotate each point back by -w*t and remove translation v*t
    R = so3_exp(-angular_vel[None, :] * t[:, None])  # [N, 3, 3]
    out = jnp.einsum("nij,nj->ni", R, points) - linear_vel[None, :] * t[:, None]
    return jnp.where(mask[:, None], out, points)

"""Ground Plane Fitting (GPF) segmentation.

Re-design of GroundPlaneFit_node (src/apps/GroundPlaneFit_node.cpp:92-361,
after "Fast Segmentation of 3D Point Clouds: A Paradigm on LiDAR Data"):
seed with the lowest-point representative (LPR), then iterate {SVD plane fit
on the current ground set, re-threshold all points by plane distance}.

All iterations are fixed-count jitted array ops; the z-sort becomes a
top-k of negative z for the LPR estimate.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud


@dataclasses.dataclass(frozen=True)
class GroundSegConfig:
    """Parameters as in the node (GroundPlaneFit_node.cpp:100-120)."""

    sensor_height: float = 1.8
    num_lpr: int = 20
    th_seeds: float = 1.2
    th_dist: float = 0.3
    num_iter: int = 3


@partial(jax.jit, static_argnames=("cfg",))
def segment_ground(cloud: PointCloud, cfg: GroundSegConfig = GroundSegConfig()):
    """Returns (ground_mask, nonground_mask) over the cloud's points.

    Points below -1.5 * sensor_height are treated as spurious reflections
    and excluded from both sets (the node's error-point removal, :205-214).
    """
    pts = cloud.points
    mask = cloud.mask
    z = pts[:, 2]

    usable = mask & (z > -1.5 * cfg.sensor_height)

    # LPR: mean z of the num_lpr lowest usable points (extract_initial_seeds_)
    neg_z = jnp.where(usable, -z, -jnp.inf)
    lowest, _ = jax.lax.top_k(neg_z, cfg.num_lpr)
    ok = jnp.isfinite(lowest)
    lpr = jnp.sum(jnp.where(ok, -lowest, 0.0)) / jnp.maximum(jnp.sum(ok), 1)

    ground = usable & (z < lpr + cfg.th_seeds)

    def fit_and_threshold(ground, _):
        w = ground.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 3.0)
        mu = jnp.sum(pts * w[:, None], axis=0) / n
        d = (pts - mu) * w[:, None]
        cov = d.T @ d / n
        # plane normal = smallest-eigenvalue direction (estimate_plane_)
        evals, evecs = jnp.linalg.eigh(cov)
        normal = evecs[:, 0]
        dist = (pts - mu) @ normal
        new_ground = usable & (jnp.abs(dist) < cfg.th_dist)
        return new_ground, None

    ground, _ = jax.lax.scan(fit_and_threshold, ground, None, length=cfg.num_iter)
    nonground = usable & ~ground
    return ground, nonground

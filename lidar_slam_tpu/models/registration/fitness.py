"""Point-NN fitness score — the PCL getFitnessScore the reference's loop
closing actually gates on.

The reference's loop verification registers with the PCL NDT wrapper
(loop_closing.cpp:78-80 -> NDTRegistration) whose GetFitnessScore
(ndt_registration.cpp:63-66) is pcl::Registration::getFitnessScore():
the mean SQUARED distance from each transformed source point to its
nearest TARGET POINT (kd-tree NN over the 0.3 m-filtered submap cloud).
That is a different quantity from the manual-NDT centroid fitness
(NormalDistributionsTransform.cpp:940-965, ops in ndt.ndt_fitness_score):
voxel centroids on planar structure sit ~0.3 m from member points at
res 1.0, so the centroid metric has a ~0.3 m floor at a PERFECT pose and
can never pass the reference's 0.2 loop gate — point-NN distances have no
such floor.

TPU-native design: nearest neighbour via the CSR bucket grid
(ops/hashgrid.py) instead of a kd-tree — fixed-shape, batched, jittable.

Deviations from PCL (documented):

1. PCL's default max_range is unbounded, so source points with no target
   anywhere near still contribute their true squared distance. A bucket
   grid only searches a bounded radius; points with no neighbour within
   `max_radius` contribute max_radius^2 instead. At a true loop the submap
   (±2 keyframes of full-range scans) covers the query scan's field of
   view, so almost nothing clamps; at a false loop the clamp only makes
   rejection more decisive.
2. Each stencil cell reads at most `bucket_k` candidates; denser cells are
   truncated and the true NN can be missed (distance then comes from
   another candidate — an overestimate, never an underestimate). The
   submap fed to this gate is 0.3 m-voxel-downsampled
   (loop_closing.cpp:300-304 semantics), so a 2 m bucket cell holds at
   most ~(2/0.3)^2 ≈ 44 points per surface crossing it; the default
   bucket_k=128 covers ~3 surfaces per cell, which no measured world
   exceeds. tests/test_fitness_nn.py asserts exact agreement with
   brute-force NN on a deliberately dense multi-surface cell.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.hashgrid import build_bucket_grid, knn_query
from ...ops.pointcloud import PointCloud


def point_nn_fitness_score(
    target: PointCloud,
    source: PointCloud,
    pose,
    max_radius: float = 2.0,
    grid_dims=(64, 64, 32),
    bucket_k: int = 128,
) -> jax.Array:
    """Mean squared NN distance from posed source points to target points.

    Mirrors pcl::Registration::getFitnessScore() as consumed by the
    reference's loop gate (loop_closing.cpp:253, fitness_score_limit 0.2).
    Returns a scalar f32 (device); jit-compatible.
    """
    T = jnp.asarray(pose, jnp.float32)
    xp = source.points @ T[:3, :3].T + T[:3, 3]

    # centre the grid on the posed scan so the searched window follows the
    # loop candidate wherever the map frame put it
    center = jnp.sum(jnp.where(source.mask[:, None], xp, 0.0), axis=0) / jnp.maximum(
        jnp.sum(source.mask), 1.0
    )
    extent = jnp.asarray(grid_dims, jnp.float32) * jnp.float32(max_radius)
    origin = center - 0.5 * extent

    grid = build_bucket_grid(target, cell_size=max_radius, dims=grid_dims, origin=origin)
    # chunk=1024 bounds the [chunk, 27, bucket_k, 3] candidate gather to
    # ~42 MB at bucket_k=128 (the un-truncating k raised per round-4 advice)
    _, dist, valid = knn_query(
        grid, xp, k=1, max_radius=max_radius, bucket_k=bucket_k, chunk=1024
    )
    d2 = jnp.where(valid[:, 0], dist[:, 0] ** 2, jnp.float32(max_radius * max_radius))
    m = source.mask.astype(jnp.float32)
    return jnp.sum(d2 * m) / jnp.maximum(jnp.sum(m), 1.0)

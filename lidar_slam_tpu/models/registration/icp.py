"""TPU-native ICP: point-to-point and weighted point-to-plane.

Re-design of the reference's manual ICP
(src/models/registration/icp_registration_manual.cpp:12-179): per Gauss-Newton
iteration the reference transforms the source, kd-tree-searches the target,
gates by `max_correspond_dis`, builds H = sum J^T J / b = -sum J^T e with
J = [I | -R hat(p)] and updates t/R via Sophus SO3::exp.

Here the kd-tree is a static bucket grid (ops/hashgrid.py), correspondences
are batched, the update is a left-multiplied SE(3) exponential, and the
iteration is a bounded `lax.while_loop`. The point-to-plane variant with
per-point static weights is the SURVEY §7.3 superset (the reference only has
point-to-point); normals come from batched eigen-analysis of KNN
neighbourhoods (ops/eigh3.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ...geom.se3 import se3_exp, transform_points
from ...ops.eigh3 import sym_eigh3
from ...ops.hashgrid import BucketGrid, build_bucket_grid, knn_query
from ...ops.pointcloud import PointCloud


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Static ICP parameters. Defaults follow the manual ICP's operating
    point (max_correspond_dis / max_iterations from config YAML usage,
    icp_registration_manual.cpp:21-30)."""

    max_corr_dist: float = 1.0
    max_iter: int = 30
    trans_eps: float = 1e-4  # convergence threshold on |delta twist|
    mode: str = "point_to_point"  # or "point_to_plane"
    huber_delta: float = 0.0  # 0 = plain least squares
    grid_dims: Tuple[int, int, int] = (128, 128, 32)
    normal_k: int = 10
    bucket_k: int = 16
    chunk: int = 8192


@flax.struct.dataclass
class ICPTarget:
    """Prepared target: bucket grid (+ normals for point-to-plane).
    The SetInputTarget analog (icp_registration_manual.cpp:34-44)."""

    cloud: PointCloud
    grid: BucketGrid
    normals: Optional[jax.Array]  # [N, 3] or None


@flax.struct.dataclass
class ICPResult:
    pose: jax.Array  # [4, 4]
    fitness: jax.Array  # mean squared NN distance (PCL getFitnessScore convention)
    iterations: jax.Array
    converged: jax.Array
    num_correspondences: jax.Array


def estimate_normals(cloud: PointCloud, grid: BucketGrid, k: int = 10, radius: float = 1.0, chunk: int = 8192):
    """Per-point normals from the smallest-eigenvalue direction of the KNN
    covariance (the standard PCL NormalEstimation recipe, vectorized)."""
    idx, dist, ok = knn_query(grid, cloud.points, k=k, max_radius=radius, chunk=chunk)
    neigh = cloud.points[idx]  # [N, k, 3]
    okf = ok.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(okf.sum(axis=1), 1.0)
    mu = (neigh * okf).sum(axis=1) / cnt
    d = (neigh - mu[:, None, :]) * okf
    cov = jnp.einsum("nki,nkj->nij", d, d) / jnp.maximum(cnt[..., :1], 1.0)[..., None]
    evals, evecs = sym_eigh3(cov)
    normals = evecs[..., 0]  # smallest eigenvalue direction
    good = (ok.sum(axis=-1) >= 3) & cloud.mask
    return jnp.where(good[:, None], normals, 0.0), good


@partial(jax.jit, static_argnames=("config",))
def prepare_icp_target(cloud: PointCloud, config: ICPConfig, origin=None) -> ICPTarget:
    cell = max(config.max_corr_dist, 1e-3)
    grid = build_bucket_grid(cloud, cell_size=cell, dims=config.grid_dims, origin=origin)
    normals = None
    if config.mode == "point_to_plane":
        normals, _ = estimate_normals(
            cloud, grid, k=config.normal_k, radius=config.max_corr_dist, chunk=config.chunk
        )
    return ICPTarget(cloud=cloud, grid=grid, normals=normals)


def _huber_weight(r2, delta):
    if delta <= 0.0:
        return jnp.ones_like(r2)
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)


def _gn_step(target: ICPTarget, src_pts, src_mask, src_w, T, config: ICPConfig):
    """One Gauss-Newton step: correspondences + normal equations + solve."""
    xp = transform_points(T, src_pts)
    idx, dist, ok = knn_query(
        target.grid, xp, k=1, max_radius=config.max_corr_dist,
        bucket_k=config.bucket_k, chunk=config.chunk,
    )
    nn = target.cloud.points[idx[:, 0]]  # [N, 3]
    valid = ok[:, 0] & src_mask
    w = valid.astype(jnp.float32) * src_w

    if config.mode == "point_to_plane":
        n = target.normals[idx[:, 0]]
        r = jnp.sum(n * (xp - nn), axis=-1)  # [N]
        w = w * _huber_weight(r * r, config.huber_delta)
        # J = [n ; xp x n]  (left-perturbation: x' = exp(delta) T p)
        J = jnp.concatenate([n, jnp.cross(xp, n)], axis=-1)  # [N, 6]
        H = jnp.einsum("n,ni,nj->ij", w, J, J)
        g = jnp.einsum("n,ni,n->i", w, J, r)
    else:
        e = xp - nn  # [N, 3]
        r2 = jnp.sum(e * e, axis=-1)
        w = w * _huber_weight(r2, config.huber_delta)
        # J_i = [I | -hat(xp)] rows; normal equations assembled in closed form
        x, y, z = xp[:, 0], xp[:, 1], xp[:, 2]
        zero = jnp.zeros_like(x)
        hat = jnp.stack(
            [
                jnp.stack([zero, -z, y], axis=-1),
                jnp.stack([z, zero, -x], axis=-1),
                jnp.stack([-y, x, zero], axis=-1),
            ],
            axis=-2,
        )
        J = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), hat.shape), -hat], axis=-1
        )  # [N, 3, 6]
        H = jnp.einsum("n,nri,nrj->ij", w, J, J)
        g = jnp.einsum("n,nri,nr->i", w, J, e)

    # Levenberg guard for rank-deficient scenes
    H = H + 1e-6 * jnp.eye(6)
    delta = -jnp.linalg.solve(H, g)
    n_corr = jnp.sum(valid.astype(jnp.int32))
    mean_sq = jnp.sum(jnp.where(valid, dist[:, 0] ** 2, 0.0)) / jnp.maximum(n_corr, 1)
    return delta, n_corr, mean_sq


@partial(jax.jit, static_argnames=("config",))
def icp_align(
    target: ICPTarget,
    source: PointCloud,
    init_pose,
    config: ICPConfig = ICPConfig(),
) -> ICPResult:
    """Align source to the prepared target starting from init_pose [4,4].

    ScanMatch analog (icp_registration_manual.cpp:46-60, calculateTrans
    :125-178), as a bounded while_loop with twist-norm convergence.
    """
    src_pts = source.points
    src_mask = source.mask
    src_w = source.get_weights()
    T0 = jnp.asarray(init_pose, jnp.float32)

    def cond(st):
        _, it, converged, _, _ = st
        return (~converged) & (it < config.max_iter)

    def body(st):
        T, it, _, _, _ = st
        delta, n_corr, mean_sq = _gn_step(target, src_pts, src_mask, src_w, T, config)
        ok = jnp.all(jnp.isfinite(delta)) & (n_corr >= 6)
        delta = jnp.where(ok, delta, 0.0)
        T_new = se3_exp(delta) @ T
        converged = (~ok) | (jnp.linalg.norm(delta) < config.trans_eps)
        return (T_new, it + 1, converged, n_corr, mean_sq)

    init = (T0, jnp.int32(0), jnp.bool_(False), jnp.int32(0), jnp.float32(jnp.inf))
    T, iters, converged, n_corr, mean_sq = jax.lax.while_loop(cond, body, init)
    return ICPResult(
        pose=T, fitness=mean_sq, iterations=iters, converged=converged, num_correspondences=n_corr
    )

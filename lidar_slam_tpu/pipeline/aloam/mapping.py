"""A-LOAM scan-to-map refinement.

Re-design of laserMapping (A-LOAM-devel/src/laserMapping.cpp:66-938):

- map structure: instead of the reference's 21x21x11 rolling cube-pointer
  array (:74-104, 312-509), the corner/surf feature maps are flat
  fixed-capacity world-frame PointClouds, voxel-downsampled (lineRes 0.4 /
  planeRes 0.8, :905-910) and box-cropped around the sensor on every update
  — the same bounded-map semantics without pointer shuffling;
- corner factors: 5-NN -> covariance eigendecomposition; if lambda_max >
  3 * lambda_mid the neighbourhood is a line: +-0.1 m pseudo-points along
  the principal direction feed the point-to-line residual (:571-621);
- surf factors: 5-NN plane fit solving A n = -1, validity gate
  |n . p_i + 1|/|n| <= 0.2, point-to-plane residual (:643-688);
- 2 outer correspondence rounds x 4 Gauss-Newton iterations with Huber(0.1)
  (:712-722), replacing Ceres;
- the map->odom correction transform (transformAssociateToMap /
  transformUpdate, :148-152, 735) is maintained by the host wrapper.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...geom.se3 import se3_exp, so3_hat, transform_points
from ...ops.eigh3 import sym_eigh3
from ...ops.hashgrid import build_bucket_grid, knn_query
from ...ops.linalg3 import solve3
from ...ops.pointcloud import PointCloud, voxel_downsample
from .feature_extraction import ScanFeatures


@dataclasses.dataclass(frozen=True)
class AloamMappingConfig:
    line_res: float = 0.4  # mapping_line_resolution (HDL-64 launch)
    plane_res: float = 0.8  # mapping_plane_resolution
    corner_map_capacity: int = 65536
    surf_map_capacity: int = 131072
    crop_radius: float = 150.0  # keep map points within this box of the pose
    nn_radius: float = 1.0  # 5-NN gate: sqDist[4] < 1.0 (laserMapping.cpp:575,645)
    outer_iters: int = 2
    gn_iters: int = 4
    huber_delta: float = 0.1
    eig_ratio: float = 3.0  # line test (:594)
    plane_tol: float = 0.2  # plane validity (:672)
    grid_cell: float = 1.0
    grid_dims: Tuple[int, int, int] = (192, 192, 32)
    knn_k: int = 5
    bucket_k: int = 16
    chunk: int = 2048
    # correspondence search backend: 'xla' | 'fused' | 'auto' (fused on TPU)
    knn: str = "auto"
    knn_window: int = 2048
    knn_tile: int = 128
    # incoming feature stacks are voxel-downsampled at line/plane res before
    # matching and folding (downSizeFilterCorner/Surf, laserMapping.cpp:556-566)
    stack_corner_capacity: int = 8192
    stack_surf_capacity: int = 16384


@partial(jax.jit, static_argnames=("cfg",))
def downsample_stacks(
    cur_corner: PointCloud, cur_surf: PointCloud, cfg: AloamMappingConfig
) -> Tuple[PointCloud, PointCloud]:
    """The corner/surf *stacks* — current features voxel-downsampled at the
    map resolutions — are what both scan-to-map matching and the map fold
    consume (laserCloudCornerStack/SurfStack, laserMapping.cpp:556-566)."""
    c = voxel_downsample(
        cur_corner, cfg.line_res, out_capacity=cfg.stack_corner_capacity
    ).replace(weights=None)
    s = voxel_downsample(
        cur_surf, cfg.plane_res, out_capacity=cfg.stack_surf_capacity
    ).replace(weights=None)
    return c, s


def _huber_w(rnorm, delta):
    return jnp.where(rnorm <= delta, 1.0, delta / jnp.maximum(rnorm, 1e-12))


def _normal_equations(xp, Jp, r, valid, delta):
    body = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (xp.shape[0], 3, 3)), -so3_hat(xp)], axis=-1
    )
    J = Jp @ body  # [N, R, 6]
    rnorm = jnp.linalg.norm(r, axis=-1)
    w = _huber_w(rnorm, delta) * valid
    H = jnp.einsum("n,nri,nrj->ij", w, J, J)
    g = jnp.einsum("n,nri,nr->i", w, J, r)
    return H, g


@partial(jax.jit, static_argnames=("cfg",))
def mapping_step(
    corner_map: PointCloud,
    surf_map: PointCloud,
    cur_corner: PointCloud,
    cur_surf: PointCloud,
    T_init,
    cfg: AloamMappingConfig = AloamMappingConfig(),
):
    """Refine T (sensor->map) against the feature maps."""
    from .odometry import _use_fused, sort_by_cell

    corner_grid = build_bucket_grid(corner_map, cfg.grid_cell, cfg.grid_dims)
    surf_grid = build_bucket_grid(surf_map, cfg.grid_cell, cfg.grid_dims)
    k = cfg.knn_k
    use_fused = _use_fused(cfg)

    if use_fused:
        T0 = jnp.asarray(T_init, jnp.float32)
        oc = sort_by_cell(corner_grid, transform_points(T0, cur_corner.points), cur_corner.mask)
        cur_corner = cur_corner.permute(oc)
        of = sort_by_cell(surf_grid, transform_points(T0, cur_surf.points), cur_surf.mask)
        cur_surf = cur_surf.permute(of)

    def nn5(grid_, map_, queries, qmask):
        """(nn [N,5,3], ok [N,5]) via the configured backend."""
        if use_fused:
            from ...ops.pallas.knn_fused import window_knn
            from ...ops.pallas.ndt_reduce import pallas_supported

            r = window_knn(
                grid_, queries, qmask, k=k, max_radius=cfg.nn_radius,
                window=cfg.knn_window, tile=cfg.knn_tile,
                interpret=not pallas_supported(),
            )
            return r["pts"], r["ok"]
        idx, dist, ok = knn_query(
            grid_, queries, k=k, max_radius=cfg.nn_radius, bucket_k=cfg.bucket_k, chunk=cfg.chunk
        )
        return map_.points[idx], ok

    def outer(T, _):
        # --- corner: line fit over 5-NN (laserMapping.cpp:571-621)
        pc = transform_points(T, cur_corner.points)
        nn, ok = nn5(corner_grid, corner_map, pc, cur_corner.mask)
        all5 = jnp.all(ok, axis=-1) & cur_corner.mask
        cen = jnp.mean(nn, axis=1)
        d = nn - cen[:, None, :]
        cov = jnp.einsum("nki,nkj->nij", d, d) / k
        evals, evecs = sym_eigh3(cov)
        is_line = evals[:, 2] > cfg.eig_ratio * evals[:, 1]
        dirv = evecs[:, :, 2]
        a_e = cen + 0.1 * dirv
        b_e = cen - 0.1 * dirv
        v_e = all5 & is_line

        # --- surf: plane fit A n = -1 over 5-NN (:643-688)
        pf = transform_points(T, cur_surf.points)
        nns, ok_s = nn5(surf_grid, surf_map, pf, cur_surf.mask)
        all5_s = jnp.all(ok_s, axis=-1) & cur_surf.mask
        AtA = jnp.einsum("nki,nkj->nij", nns, nns) + 1e-6 * jnp.eye(3)
        Atb = -jnp.sum(nns, axis=1)  # A^T * (-1 vector)
        n_raw = solve3(AtA, Atb)  # [N, 3] — adjugate beats batched LU ~20x
        n_norm = jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
        n_hat = n_raw / jnp.maximum(n_norm, 1e-9)
        d_plane = 1.0 / jnp.maximum(n_norm[:, 0], 1e-9)
        fit_ok = jnp.all(
            jnp.abs(jnp.einsum("nki,ni->nk", nns, n_hat) + d_plane[:, None]) <= cfg.plane_tol,
            axis=-1,
        )
        v_p = all5_s & fit_ok

        def gn(T, _):
            xe = transform_points(T, cur_corner.points)
            u = xe - a_e
            v = xe - b_e
            ab = b_e - a_e
            ab_n = jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-9)
            r_e = jnp.cross(u, v) / ab_n
            Jp_e = so3_hat(ab) / ab_n[..., None]
            H1, g1 = _normal_equations(xe, Jp_e, r_e, v_e.astype(jnp.float32), cfg.huber_delta)

            xf = transform_points(T, cur_surf.points)
            r_p = (jnp.sum(n_hat * xf, axis=-1) + d_plane)[:, None]
            Jp_p = n_hat[:, None, :]
            H2, g2 = _normal_equations(xf, Jp_p, r_p, v_p.astype(jnp.float32), cfg.huber_delta)

            H = H1 + H2 + 1e-4 * jnp.eye(6)
            g = g1 + g2
            delta = -jnp.linalg.solve(H, g)
            delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(6))
            return se3_exp(delta) @ T, None

        T, _ = jax.lax.scan(gn, T, None, length=cfg.gn_iters)
        return T, None

    T, _ = jax.lax.scan(outer, jnp.asarray(T_init, jnp.float32), None, length=cfg.outer_iters)
    return T


@partial(jax.jit, static_argnames=("cfg",))
def map_update(
    corner_map: PointCloud,
    surf_map: PointCloud,
    cur_corner: PointCloud,
    cur_surf: PointCloud,
    T,
    cfg: AloamMappingConfig = AloamMappingConfig(),
):
    """Fold the registered features into the maps: transform, append,
    voxel-downsample at lineRes/planeRes, crop around the pose
    (laserMapping.cpp:737-800, 905-910)."""
    pos = T[:3, 3]

    def fold(m: PointCloud, cur: PointCloud, leaf: float, cap: int) -> PointCloud:
        new_pts = transform_points(T, cur.points)
        pts = jnp.concatenate([m.points, new_pts], axis=0)
        msk = jnp.concatenate([m.mask, cur.mask], axis=0)
        inside = jnp.all(jnp.abs(pts - pos) <= cfg.crop_radius, axis=-1)
        cloud = PointCloud(points=pts, mask=msk & inside)
        out = voxel_downsample(cloud, leaf, out_capacity=cap)
        # keep the map pytree structure identical to the init state (no
        # weights leaf): AloamState must be a stable lax.scan carry
        return out.replace(weights=None)

    new_corner = fold(corner_map, cur_corner, cfg.line_res, cfg.corner_map_capacity)
    new_surf = fold(surf_map, cur_surf, cfg.plane_res, cfg.surf_map_capacity)
    return new_corner, new_surf


class AloamMapping:
    """Host wrapper: map state + map->odom correction (transformAssociateToMap)."""

    def __init__(self, config: AloamMappingConfig = AloamMappingConfig()):
        self.cfg = config
        self.corner_map = PointCloud(
            points=jnp.zeros((config.corner_map_capacity, 3), jnp.float32),
            mask=jnp.zeros(config.corner_map_capacity, bool),
        )
        self.surf_map = PointCloud(
            points=jnp.zeros((config.surf_map_capacity, 3), jnp.float32),
            mask=jnp.zeros(config.surf_map_capacity, bool),
        )
        self.T_map_odom = np.eye(4, dtype=np.float32)  # wmap_T_wodom
        self._initialized = False

    def update(self, features: ScanFeatures, T_odom) -> np.ndarray:
        """Refine the odometry pose against the map; returns the map-frame
        pose. `features`: the sweep's less_sharp/less_flat clouds."""
        T_odom = np.asarray(T_odom, np.float32)
        guess = self.T_map_odom @ T_odom  # transformAssociateToMap
        cur_corner, cur_surf = downsample_stacks(
            features.less_sharp, features.less_flat, self.cfg
        )

        if self._initialized:
            T_map = np.asarray(
                mapping_step(self.corner_map, self.surf_map, cur_corner, cur_surf, jnp.asarray(guess), self.cfg)
            )
        else:
            T_map = guess
            self._initialized = True

        self.corner_map, self.surf_map = map_update(
            self.corner_map, self.surf_map, cur_corner, cur_surf, jnp.asarray(T_map), self.cfg
        )
        self.T_map_odom = (T_map @ np.linalg.inv(T_odom)).astype(np.float32)  # transformUpdate
        return T_map

"""A-LOAM frame-to-frame laser odometry.

Re-design of laserOdometry (A-LOAM-devel/src/laserOdometry.cpp:62-601):
per sweep, 2 outer correspondence rounds x 4 Gauss-Newton iterations over

- corner (sharp) points: nearest neighbour in the previous less-sharp cloud
  + the closest point on an adjacent ring (within NEARBY_SCAN = 2.5) ->
  point-to-line residual (LidarEdgeFactor, lidarFactor.hpp:12-55);
- flat points: nearest neighbour + a same-ring and an adjacent-ring point ->
  point-to-plane residual (LidarPlaneFactor, :57-104);

with Huber(0.1) robustification replacing Ceres' loss, analytic Jacobians
replacing autodiff, and the bucket grid replacing both kd-trees. The
constant-velocity warm start (para_q/para_t carried across frames) and
DISTORTION=0 de-skew convention (TransformToStart with s = 1,
laserOdometry.cpp:111-148) are preserved.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...geom.se3 import se3_exp, so3_hat, transform_points
from ...ops.hashgrid import build_bucket_grid, knn_query, _flat_cell_id
from ...ops.pointcloud import PointCloud
from .feature_extraction import ScanFeatures


@dataclasses.dataclass(frozen=True)
class AloamOdometryConfig:
    dist_sq_threshold: float = 25.0  # DISTANCE_SQ_THRESHOLD
    nearby_scan: float = 2.5  # NEARBY_SCAN
    # The reference runs 2 outer x 4 Ceres iterations (laserOdometry.cpp:278,
    # :497) and measurably undershoots at >= 1.5 m/frame steps (1.08 m end
    # error over 10.5 m on the corridor benchmark vs 0.52 m at 3x6 and
    # 0.11 m at 4x8). Default to 3x6; set 2/4 for reference-exact cost.
    outer_iters: int = 3
    gn_iters: int = 6
    huber_delta: float = 0.1  # ceres HuberLoss(0.1) (:300)
    grid_cell: float = 5.0
    grid_dims: Tuple[int, int, int] = (48, 48, 8)
    knn_k: int = 8
    bucket_k: int = 32
    chunk: int = 2048
    # correspondence search backend: 'xla' = stencil-gather knn_query;
    # 'fused' = Pallas window kernel (ops/pallas/knn_fused.py); 'auto' =
    # fused on TPU, xla elsewhere
    knn: str = "auto"
    knn_window: int = 2048
    knn_tile: int = 128


def _use_fused(cfg) -> bool:
    from ...ops.pallas.ndt_reduce import pallas_supported

    return cfg.knn == "fused" or (cfg.knn == "auto" and pallas_supported())


def _neighbour_features(grid, tgt_pts, tgt_ring, query_pts, query_mask, cfg):
    """(cand_pts [N,k,3], cand_ring [N,k], dist [N,k], ok [N,k]) via the
    configured backend. The fused kernel returns neighbour rows directly
    (no post-gather) and is exact (no bucket_k truncation)."""
    if _use_fused(cfg):
        from ...ops.pallas.knn_fused import window_knn
        from ...ops.pallas.ndt_reduce import pallas_supported

        r = window_knn(
            grid, query_pts, query_mask, k=cfg.knn_k,
            max_radius=float(np.sqrt(cfg.dist_sq_threshold)), extras=tgt_ring,
            window=cfg.knn_window, tile=cfg.knn_tile,
            interpret=not pallas_supported(),
        )
        return r["pts"], r["extras"][..., 0], r["dist"], r["ok"]
    idx, dist, ok = knn_query(
        grid, query_pts, k=cfg.knn_k, max_radius=jnp.sqrt(cfg.dist_sq_threshold),
        bucket_k=cfg.bucket_k, chunk=cfg.chunk,
    )
    return tgt_pts[idx], tgt_ring[idx], dist, ok


def sort_by_cell(grid, points, mask):
    """Order that sorts points by their bucket-grid cell id (masked last);
    spatially coherent tiles keep the fused kernel's windows narrow."""
    dims = grid.dims
    coords = jnp.floor((points - grid.origin) / grid.cell_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(dims, jnp.int32) - 1)
    cid = jnp.where(mask, _flat_cell_id(coords, dims), jnp.int32(2**30))
    return jnp.argsort(cid)


def _corner_correspondences(grid, tgt_pts, tgt_ring, query_pts, query_mask, cfg):
    """For each query corner: (a, b, valid) — NN + best adjacent-ring point
    (laserOdometry.cpp:299-384)."""
    cand_pts, cand_ring, dist, ok = _neighbour_features(
        grid, tgt_pts, tgt_ring, query_pts, query_mask, cfg
    )
    d2 = dist**2

    nn_ok = ok[:, 0] & (d2[:, 0] < cfg.dist_sq_threshold) & query_mask
    a = cand_pts[:, 0]
    ring_a = cand_ring[:, 0]

    ring_diff = jnp.abs(cand_ring - ring_a[:, None]).astype(jnp.float32)
    second_ok = (
        ok
        & (d2 < cfg.dist_sq_threshold)
        & (cand_ring != ring_a[:, None])
        & (ring_diff <= cfg.nearby_scan)
    )
    second_ok = second_ok.at[:, 0].set(False)
    d2_second = jnp.where(second_ok, d2, jnp.inf)
    jbest = jnp.argmin(d2_second, axis=-1)
    has_second = jnp.isfinite(jnp.min(d2_second, axis=-1))
    b = jnp.take_along_axis(cand_pts, jbest[:, None, None], axis=1)[:, 0]
    valid = nn_ok & has_second
    return a, b, valid


def _plane_correspondences(grid, tgt_pts, tgt_ring, query_pts, query_mask, cfg):
    """For each query flat point: (a, b, c, valid) — NN + same-ring +
    adjacent-ring points (laserOdometry.cpp:387-482)."""
    cand_pts, cand_ring, dist, ok = _neighbour_features(
        grid, tgt_pts, tgt_ring, query_pts, query_mask, cfg
    )
    d2 = dist**2

    nn_ok = ok[:, 0] & (d2[:, 0] < cfg.dist_sq_threshold) & query_mask
    a = cand_pts[:, 0]
    ring_a = cand_ring[:, 0]

    gate = ok & (d2 < cfg.dist_sq_threshold)
    gate = gate.at[:, 0].set(False)

    same = gate & (cand_ring == ring_a[:, None])
    d2_same = jnp.where(same, d2, jnp.inf)
    jb = jnp.argmin(d2_same, axis=-1)
    has_b = jnp.isfinite(jnp.min(d2_same, axis=-1))
    b = jnp.take_along_axis(cand_pts, jb[:, None, None], axis=1)[:, 0]

    ring_diff = jnp.abs(cand_ring - ring_a[:, None]).astype(jnp.float32)
    adj = gate & (cand_ring != ring_a[:, None]) & (ring_diff <= cfg.nearby_scan)
    d2_adj = jnp.where(adj, d2, jnp.inf)
    jc = jnp.argmin(d2_adj, axis=-1)
    has_c = jnp.isfinite(jnp.min(d2_adj, axis=-1))
    c = jnp.take_along_axis(cand_pts, jc[:, None, None], axis=1)[:, 0]

    valid = nn_ok & has_b & has_c
    return a, b, c, valid


def _huber_w(rnorm, delta):
    return jnp.where(rnorm <= delta, 1.0, delta / jnp.maximum(rnorm, 1e-12))


def _accumulate_normal_equations(xp, J_r_about_p, r, valid, delta):
    """H, g from per-point residual Jacobians; J wrt twist = Jp @ [I, -hat(xp)]."""
    body = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (xp.shape[0], 3, 3)), -so3_hat(xp)], axis=-1
    )  # [N, 3, 6]
    J = J_r_about_p @ body  # [N, R, 6]  (R = residual dim)
    rnorm = jnp.linalg.norm(r, axis=-1)
    w = _huber_w(rnorm, delta) * valid
    H = jnp.einsum("n,nri,nrj->ij", w, J, J)
    g = jnp.einsum("n,nri,nr->i", w, J, r)
    return H, g


@partial(jax.jit, static_argnames=("cfg",))
def odometry_step(
    prev_sharp: PointCloud,
    prev_sharp_ring,
    prev_flat: PointCloud,
    prev_flat_ring,
    cur_sharp: PointCloud,
    cur_flat: PointCloud,
    T_rel_init,
    cfg: AloamOdometryConfig = AloamOdometryConfig(),
):
    """Estimate the current->previous relative transform."""
    corner_grid = build_bucket_grid(prev_sharp, cfg.grid_cell, cfg.grid_dims)
    surf_grid = build_bucket_grid(prev_flat, cfg.grid_cell, cfg.grid_dims)

    if _use_fused(cfg):
        # sort queries by target cell once at the initial estimate so the
        # fused kernel's per-tile windows stay narrow (exactness is guarded
        # by the kernel's unresolved count regardless)
        T0 = jnp.asarray(T_rel_init, jnp.float32)
        oc = sort_by_cell(corner_grid, transform_points(T0, cur_sharp.points), cur_sharp.mask)
        cur_sharp = cur_sharp.permute(oc)
        of = sort_by_cell(surf_grid, transform_points(T0, cur_flat.points), cur_flat.mask)
        cur_flat = cur_flat.permute(of)

    def outer(T_rel, _):
        # correspondences at the current estimate (TransformToStart)
        pc = transform_points(T_rel, cur_sharp.points)
        a_e, b_e, v_e = _corner_correspondences(
            corner_grid, prev_sharp.points, prev_sharp_ring, pc, cur_sharp.mask, cfg
        )
        pf = transform_points(T_rel, cur_flat.points)
        a_p, b_p, c_p, v_p = _plane_correspondences(
            surf_grid, prev_flat.points, prev_flat_ring, pf, cur_flat.mask, cfg
        )
        # plane normals fixed per outer round (as the factor precomputes them)
        n_raw = jnp.cross(a_p - b_p, a_p - c_p)
        n_norm = jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
        n_hat = n_raw / jnp.maximum(n_norm, 1e-9)
        v_p2 = v_p & (n_norm[:, 0] > 1e-9)

        def gn(T_rel, _):
            xe = transform_points(T_rel, cur_sharp.points)
            u = xe - a_e
            v = xe - b_e
            ab = b_e - a_e
            ab_norm = jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-9)
            r_e = jnp.cross(u, v) / ab_norm  # [N, 3] (LidarEdgeFactor)
            Jp_e = so3_hat(ab) / ab_norm[..., None]
            H1, g1 = _accumulate_normal_equations(
                xe, Jp_e, r_e, v_e.astype(jnp.float32), cfg.huber_delta
            )

            xf = transform_points(T_rel, cur_flat.points)
            r_p = jnp.sum(n_hat * (xf - a_p), axis=-1, keepdims=True)  # [N, 1]
            Jp_p = n_hat[:, None, :]  # [N, 1, 3]
            H2, g2 = _accumulate_normal_equations(
                xf, Jp_p, r_p, v_p2.astype(jnp.float32), cfg.huber_delta
            )

            H = H1 + H2 + 1e-4 * jnp.eye(6)
            g = g1 + g2
            delta = -jnp.linalg.solve(H, g)
            delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(6))
            return se3_exp(delta) @ T_rel, None

        T_rel, _ = jax.lax.scan(gn, T_rel, None, length=cfg.gn_iters)
        return T_rel, None

    T_rel, _ = jax.lax.scan(outer, jnp.asarray(T_rel_init, jnp.float32), None, length=cfg.outer_iters)
    return T_rel


class AloamOdometry:
    """Host wrapper holding the previous frame's features and world pose."""

    def __init__(self, config: AloamOdometryConfig = AloamOdometryConfig()):
        self.cfg = config
        self.T_world = np.eye(4, dtype=np.float32)
        self.T_rel = np.eye(4, dtype=np.float32)  # constant-velocity warm start
        self._prev: Optional[ScanFeatures] = None

    def update(self, features: ScanFeatures) -> np.ndarray:
        """Feed one sweep's features; returns the world pose of this sweep."""
        if self._prev is not None:
            T_rel = odometry_step(
                self._prev.less_sharp,
                self._prev.less_sharp_ring,
                self._prev.less_flat,
                self._prev.less_flat_ring,
                features.sharp,
                features.flat,
                jnp.asarray(self.T_rel),
                self.cfg,
            )
            self.T_rel = np.asarray(T_rel)
            self.T_world = (self.T_world @ self.T_rel).astype(np.float32)
        self._prev = features
        return self.T_world.copy()

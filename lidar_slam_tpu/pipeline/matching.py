"""Map-matching localization against a prebuilt map.

Re-design of Matching (src/matching/matching.cpp:19-455,
matching_flow.cpp:12-125): localize scans in a prebuilt global map with NDT,
box-cropped local maps refreshed near the crop edge, GNSS initialization in
two modes — FullPose (use the GNSS pose as the first guess) and OnlyPosition
(position + exhaustive yaw grid search over a 2-D Gaussian height map,
matching.cpp:197-242, 267-308, 344-394).

The yaw search is one batched device op: all `yaw_samples` rotations of the
scan are scored against the per-cell (mu, sigma) height statistics in a
single gather+reduce, vs the reference's 270-iteration CPU loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registration import NDTConfig, build_ndt_map, ndt_align
from ..ops.pointcloud import PointCloud, box_crop_mask, finite_mask, voxel_downsample


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Operating point from config/matching/matching.yaml."""

    ndt: NDTConfig = NDTConfig(resolution=1.0, grid_dims=(224, 224, 48), point_chunk=8192, gather="auto")
    frame_leaf: float = 0.5
    local_map_leaf: float = 0.3
    box_size: float = 200.0  # local map crop edge length
    refresh_margin: float = 50.0  # re-crop when this close to the edge
    local_map_capacity: int = 1 << 18
    frame_capacity: int = 32768
    raw_capacity: int = 131072  # fixed input padding (shape-stable jit)
    # yaw-init height map (matching.cpp:344-394)
    cell_size: float = 0.8
    height_map_dim: int = 256  # cells per axis over the local map
    yaw_samples: int = 270
    yaw_agree_tol: float = 0.03  # two consecutive estimates must agree [rad]
    init_mode: str = "full_pose"  # 'full_pose' | 'only_position'
    # coarse-to-fine matching (see FrontEndConfig.coarse_to_fine)
    coarse_to_fine: bool = True
    # GPF ground removal before matching: the reference's matching_flow
    # subscribes /points_noground_synced (matching_flow.cpp:14), i.e. the
    # localization front end consumes the GroundPlaneFit node's no-ground
    # cloud unconditionally — so True is the parity default (and measured
    # better: the ground dominates point count but carries little lateral
    # information). Mapping stays ground-in, like the reference
    # (GroundPlaneFit is commented out of mapping.launch:4).
    use_ground_seg: bool = True


@partial(jax.jit, static_argnames=("cfg", "coarse_cfg"))
def _match_step(
    fine_map,
    coarse_map,  # == fine_map when coarse-to-fine is off
    raw_pts,
    raw_msk,
    predict,  # [4, 4] motion-model guess
    cfg: "MatchingConfig",
    coarse_cfg: Optional[NDTConfig],
):
    """One localization frame as ONE device dispatch: ground removal ->
    voxel downsample -> coarse-to-fine NDT (Matching::Update,
    matching.cpp:185-265). The un-fused path cost four dispatches with a
    host round trip after each — ~100 ms of pure transport per frame on
    the tunneled backend; production wants exactly one program + one pose
    fetch (the same shape as front_end._track_step)."""
    mj = raw_msk & finite_mask(raw_pts)
    if cfg.use_ground_seg:
        from ..models.ground_seg import GroundSegConfig, segment_ground

        _, nonground = segment_ground(
            PointCloud(points=jnp.where(mj[:, None], raw_pts, 0.0), mask=mj),
            GroundSegConfig(),
        )
        mj = mj & nonground
    frame = voxel_downsample(
        PointCloud(points=jnp.where(mj[:, None], raw_pts, 0.0), mask=mj),
        cfg.frame_leaf,
        out_capacity=cfg.frame_capacity,
    )
    guess = predict
    unresolved = jnp.float32(0.0)
    if coarse_cfg is not None:
        rc = ndt_align(coarse_map, frame, guess, coarse_cfg)
        guess = rc.pose
        unresolved = rc.unresolved
    r = ndt_align(fine_map, frame, guess, cfg.ndt)
    return frame.points, frame.mask, r.pose, unresolved + r.unresolved


@partial(jax.jit, static_argnames=("cfg", "coarse_cfg"))
def matching_drive(
    fine_map,
    coarse_map,
    pts_seq,  # [T, N, 3] preloaded raw frames
    msk_seq,  # [T, N]
    init_pose,  # [4, 4]
    cfg: "MatchingConfig",
    coarse_cfg: Optional[NDTConfig],
):
    """Whole-sequence localization as ONE device program: chains _match_step
    through `lax.scan` with constant-velocity prediction (the per-frame host
    round trip disappears; frame-to-frame dependency is preserved, honest
    sequential semantics). Valid BETWEEN local-map refreshes — the box-crop
    refresh (matching.cpp:166-183) is a host decision, so callers drive in
    chunks and refresh between chunks (the 200 m box with a 50 m margin
    gives ~100 m of travel per chunk). Returns (poses [T, 4, 4],
    unresolved [T])."""

    def one(carry, inp):
        cur, step = carry
        pts, msk = inp
        predict = cur @ step
        _, _, pose, unres = _match_step.__wrapped__(
            fine_map, coarse_map, pts, msk, predict, cfg, coarse_cfg
        )
        new_step = jnp.linalg.solve(cur, pose)
        return (pose, new_step), (pose, unres)

    eye = jnp.eye(4, dtype=jnp.float32)
    (_, _), (poses, unres) = jax.lax.scan(one, (init_pose, eye), (pts_seq, msk_seq))
    return poses, unres


@partial(jax.jit, static_argnames=("dim", "cell"))
def _height_map(points, mask, origin, dim: int, cell: float):
    """Per-cell mean/std of z over the local map (generateGauss2DMapCells)."""
    xy = jnp.floor((points[:, :2] - origin) / cell).astype(jnp.int32)
    inb = jnp.all((xy >= 0) & (xy < dim), axis=-1) & mask
    cid = jnp.where(inb, xy[:, 0] * dim + xy[:, 1], 0)
    w = inb.astype(jnp.float32)
    v = dim * dim
    cnt = jax.ops.segment_sum(w, cid, num_segments=v)
    sz = jax.ops.segment_sum(points[:, 2] * w, cid, num_segments=v)
    szz = jax.ops.segment_sum(points[:, 2] ** 2 * w, cid, num_segments=v)
    n = jnp.maximum(cnt, 1.0)
    mu = sz / n
    var = jnp.maximum(szz / n - mu * mu, 1e-4)
    return mu, jnp.sqrt(var), cnt > 0


@partial(jax.jit, static_argnames=("dim", "cell", "n_yaw"))
def _yaw_search(scan_pts, scan_mask, position, mu, sigma, occ, origin, dim: int, cell: float, n_yaw: int):
    """Score all yaw rotations of the scan against the height map
    (getInitialYawAngle, matching.cpp:267-308). Returns (best_yaw, scores)."""
    yaws = jnp.arange(n_yaw) * (2.0 * jnp.pi / n_yaw)
    c, s = jnp.cos(yaws), jnp.sin(yaws)  # [Y]
    x, y, z = scan_pts[:, 0], scan_pts[:, 1], scan_pts[:, 2]
    # rotated world coords for every yaw: [Y, N]
    wx = c[:, None] * x[None, :] - s[:, None] * y[None, :] + position[0]
    wy = s[:, None] * x[None, :] + c[:, None] * y[None, :] + position[1]
    wz = z[None, :] + position[2]
    cx = jnp.floor((wx - origin[0]) / cell).astype(jnp.int32)
    cy = jnp.floor((wy - origin[1]) / cell).astype(jnp.int32)
    inb = (cx >= 0) & (cx < dim) & (cy >= 0) & (cy < dim) & scan_mask[None, :]
    cid = jnp.where(inb, cx * dim + cy, 0)
    m = mu[cid]
    sd = sigma[cid]
    ok = inb & occ[cid]
    sc = jnp.where(ok, jnp.exp(-((wz - m) ** 2) / (2.0 * sd * sd)), 0.0)
    scores = jnp.sum(sc, axis=-1)
    return yaws[jnp.argmax(scores)], scores


class Matching:
    def __init__(self, config: MatchingConfig, global_map_points: np.ndarray):
        """`global_map_points` replaces InitGlobalMap's PCD load
        (matching.cpp:148-164); pass the viewer's filtered map."""
        self.cfg = config
        self.global_map = np.asarray(global_map_points, np.float32)
        self.local_map_origin: Optional[np.ndarray] = None
        self.ndt_map = None
        self._local_cloud = None
        self.current_pose: Optional[np.ndarray] = None
        self.predict_step = np.eye(4, dtype=np.float32)
        self._init = False
        self._last_yaw_estimate: Optional[float] = None
        self.reset_local_map(np.zeros(3, np.float32))

    # -- local map ----------------------------------------------------------
    def reset_local_map(self, center: np.ndarray) -> None:
        """ResetLocalMap (matching.cpp:166-183): crop box_size^3 around
        center, voxel filter, rebuild the NDT target."""
        cfg = self.cfg
        half = cfg.box_size / 2.0
        lo = center - half
        hi = center + half
        sel = np.all((self.global_map >= lo) & (self.global_map <= hi), axis=1)
        pts = self.global_map[sel][: cfg.local_map_capacity]
        cloud = PointCloud.from_points(pts, capacity=cfg.local_map_capacity)
        cloud = voxel_downsample(cloud, cfg.local_map_leaf, out_capacity=cfg.local_map_capacity)
        self._local_cloud = cloud
        import dataclasses as _dc

        # tracking maps feed only the align path; the dense mean/icov views
        # (a [V, 3, 3] scatter-back + full-grid eigh at 2.4M voxels) were
        # measured at ~1.5 s of the refresh stall and nothing here reads them
        self.ndt_map = build_ndt_map(cloud, _dc.replace(cfg.ndt, dense_stats=False))
        self.coarse_ndt_map = None
        if cfg.coarse_to_fine:
            self.coarse_ndt_map = build_ndt_map(
                cloud, _dc.replace(self._coarse_cfg(), dense_stats=False)
            )
        self.local_map_origin = center.copy()

    def _coarse_cfg(self):
        import dataclasses

        c = self.cfg.ndt
        return dataclasses.replace(
            c,
            resolution=c.resolution * 2.0,
            grid_dims=(c.grid_dims[0] // 2, c.grid_dims[1] // 2, c.grid_dims[2] // 2),
            max_iter=max(5, c.max_iter // 3),
            # ~1/8 the occupied voxels of the fine grid; narrower key window
            fused_window=min(c.fused_window, 1024),
        )

    def _maybe_refresh_local_map(self, position: np.ndarray) -> None:
        half = self.cfg.box_size / 2.0
        margin = self.cfg.refresh_margin
        d = np.abs(position - self.local_map_origin)
        if np.any(d > half - margin):
            self.reset_local_map(position)

    # -- initialization -----------------------------------------------------
    def set_gnss_pose(self, pose_or_position) -> bool:
        """SetGNSSPose (matching.cpp:310-342). FullPose mode takes a [4,4]
        guess; OnlyPosition takes a [3] position and estimates yaw."""
        arr = np.asarray(pose_or_position, np.float32)
        if self.cfg.init_mode == "full_pose":
            assert arr.shape == (4, 4)
            self.current_pose = arr.copy()
            self._init = True
            return True

        position = arr[:3, 3] if arr.shape == (4, 4) else arr[:3]
        self.reset_local_map(position)
        yaw = self._initial_yaw(position)
        if self._last_yaw_estimate is not None and (
            abs(yaw - self._last_yaw_estimate) < self.cfg.yaw_agree_tol
        ):
            c, s = np.cos(yaw), np.sin(yaw)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            T[:3, 3] = position
            self.current_pose = T
            self._init = True
            self._pending_scan = None
            return True
        self._last_yaw_estimate = yaw
        return False

    def _initial_yaw(self, position) -> float:
        cfg = self.cfg
        cloud = self._local_cloud
        extent = cfg.height_map_dim * cfg.cell_size
        origin = jnp.asarray(position[:2] - extent / 2.0, jnp.float32)
        mu, sigma, occ = _height_map(
            cloud.points, cloud.mask, origin, cfg.height_map_dim, cfg.cell_size
        )
        scan = getattr(self, "_pending_scan", None)
        if scan is None:
            return 0.0
        yaw, _ = _yaw_search(
            scan.points,
            scan.mask,
            jnp.asarray(position, jnp.float32),
            mu,
            sigma,
            occ,
            origin,
            cfg.height_map_dim,
            cfg.cell_size,
            cfg.yaw_samples,
        )
        return float(yaw)

    # -- per-frame update ---------------------------------------------------
    def preload(self, points, mask=None):
        """Pad to raw capacity and upload. Safe from a prefetch thread, so
        frame i+1's pad + H2D overlaps frame i's compute (cli._prefetch) —
        same protocol as FrontEnd.preload."""
        cfg = self.cfg
        points = np.asarray(points, np.float32)
        if mask is None:
            mask = np.ones(len(points), bool)
        else:
            mask = np.asarray(mask, bool)
        n = min(len(points), cfg.raw_capacity)
        pts_fixed = np.zeros((cfg.raw_capacity, 3), np.float32)
        msk_fixed = np.zeros(cfg.raw_capacity, bool)
        pts_fixed[:n] = points[:n]
        msk_fixed[:n] = mask[:n]
        return jnp.asarray(pts_fixed), jnp.asarray(msk_fixed)

    def update(self, points, mask=None, preloaded=None):
        """Matching::Update (matching.cpp:185-265). Returns pose [4,4] or
        None while uninitialized."""
        cfg = self.cfg
        pj, mj = preloaded if preloaded is not None else self.preload(points, mask)

        if not self._init:
            mjf = mj & finite_mask(pj)
            if cfg.use_ground_seg:
                from ..models.ground_seg import GroundSegConfig, segment_ground

                _, nonground = segment_ground(
                    PointCloud(points=jnp.where(mjf[:, None], pj, 0.0), mask=mjf),
                    GroundSegConfig(),
                )
                mjf = mjf & nonground
            self._pending_scan = voxel_downsample(
                PointCloud(points=jnp.where(mjf[:, None], pj, 0.0), mask=mjf),
                cfg.frame_leaf,
                out_capacity=cfg.frame_capacity,
            )
            return None

        predict = self.current_pose @ self.predict_step
        use_coarse = cfg.coarse_to_fine and self.coarse_ndt_map is not None
        coarse_cfg = self._coarse_cfg() if use_coarse else None
        coarse_map = self.coarse_ndt_map if use_coarse else self.ndt_map
        f_pts, f_mask, dev_pose, dev_unres = _match_step(
            self.ndt_map, coarse_map, pj, mj, jnp.asarray(predict), cfg, coarse_cfg
        )
        pose, unres = jax.device_get((dev_pose, dev_unres))
        if cfg.ndt.resolve_gather() == "fused" and float(unres) > 0:
            # fused-kernel exactness guard tripped (key window too narrow for
            # this map density): redo the frame on the always-exact XLA path
            frame = PointCloud(points=f_pts, mask=f_mask)
            guess = jnp.asarray(predict)
            if coarse_cfg is not None:
                guess = ndt_align(
                    coarse_map, frame, guess,
                    dataclasses.replace(coarse_cfg, gather="two_level"),
                ).pose
            pose = ndt_align(
                self.ndt_map, frame, guess,
                dataclasses.replace(cfg.ndt, gather="two_level"),
            ).pose
        pose = np.asarray(pose)
        self.predict_step = (np.linalg.inv(self.current_pose) @ pose).astype(np.float32)
        self.current_pose = pose
        self._maybe_refresh_local_map(pose[:3, 3])
        return pose

    def has_inited(self) -> bool:
        return self._init

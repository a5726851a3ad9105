"""Loop closing: Scan-Context / GNSS candidate detection + NDT verification.

Re-design of LoopClosing (src/mapping/loop_closing/loop_closing.cpp:22-330,
loop_closing_flow.cpp:12-92). Two detectors selected by `loop_method`:

- 'sc'  — Scan Context retrieval (models/scan_context.py) on each new
  keyframe (loop_closing.cpp:126-141, 202-231);
- 'gps' — nearest historical key-GNSS position by L1 distance with the
  `diff_num` separation and `detect_area` gates (:152-200).

A candidate is verified by NDT-matching the current keyframe scan against a
submap of +-`extend_frame_num` keyframes around the candidate, accepting on
fitness < `fitness_score_limit` (:233-271). Accepted loops yield
LoopPose(index0, index1, relative pose) records for the back end.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.se3 import euler_xyz_to_matrix
from ..io.keyframe_store import KeyframeStore
from ..models.registration import (
    NDTConfig,
    build_ndt_map,
    ndt_align,
    point_nn_fitness_score,
)
from ..models.scan_context import SCManager, ScanContextConfig
from ..ops.pointcloud import PointCloud, voxel_downsample


@dataclasses.dataclass(frozen=True)
class LoopClosingConfig:
    """Operating point from config/mapping/loop_closing.yaml:1-14."""

    loop_method: str = "sc"  # 'sc' | 'gps'
    loop_step: int = 3  # check every N keyframes
    diff_num: int = 100  # min keyframe separation
    detect_area: float = 10.0  # GPS candidate radius [m]
    extend_frame_num: int = 2  # submap half-width
    fitness_score_limit: float = 0.2
    ndt: NDTConfig = NDTConfig(resolution=1.0, grid_dims=(160, 160, 40), point_chunk=4096, gather="auto")
    map_filter_leaf: float = 0.3
    scan_filter_leaf: float = 0.3  # loop_closing.yaml:27-31 (map AND scan 0.3)
    submap_capacity: int = 65536
    scan_capacity: int = 16384
    sc: ScanContextConfig = ScanContextConfig()


@partial(jax.jit, static_argnames=("cfg",))
def _verify_step(sub_pts, sub_msk, scan_pts, scan_msk, guess, cfg: "LoopClosingConfig"):
    """Whole loop verification as ONE device program: downsample the joint
    submap + scan, build the NDT target, align, and score with the PCL-style
    point-NN squared fitness (CloudRegistration, loop_closing.cpp:233-319 —
    the reference's gate is pcl getFitnessScore, ndt_registration.cpp:63-66,
    mean SQUARED NN distance to the filtered submap points; the manual-NDT
    centroid fitness has a ~0.3 m planar floor at res 1.0 and can never pass
    the 0.2 limit even at a perfect pose). The un-fused version cost ~6
    dispatch+fetch chains (~600 ms on the tunneled backend); the tracking
    maps here never serve fitness lookups, so dense stats are skipped."""
    ndt_cfg = dataclasses.replace(cfg.ndt, dense_stats=False)
    submap = voxel_downsample(
        PointCloud(points=sub_pts, mask=sub_msk),
        cfg.map_filter_leaf,
        out_capacity=cfg.submap_capacity,
    )
    ndt_map = build_ndt_map(submap, ndt_cfg)
    scan = voxel_downsample(
        PointCloud(points=scan_pts, mask=scan_msk),
        cfg.scan_filter_leaf,
        out_capacity=cfg.scan_capacity,
    )
    r = ndt_align(ndt_map, scan, guess, ndt_cfg)
    fit = point_nn_fitness_score(submap, scan, r.pose)
    return r.pose, fit


@dataclasses.dataclass
class LoopPose:
    """LoopPose message (sensor_data/loop_pose.hpp:12-23)."""

    index0: int
    index1: int
    relative_pose: np.ndarray  # pose of kf index1 expressed against index0's map pose
    fitness: float = 0.0  # NDT fitness at acceptance (loop_closing.cpp:253)


class LoopClosing:
    def __init__(self, config: LoopClosingConfig, store: KeyframeStore, data_path: Optional[str] = None):
        self.cfg = config
        self.store = store
        self.sc = SCManager(config.sc)
        self.key_poses: List[np.ndarray] = []  # odom/map poses per keyframe
        self.key_gnss: List[np.ndarray] = []
        self._skip_cnt = 0
        self._skip_num = config.loop_step
        self.detected: List[LoopPose] = []
        # loop-event log, the reference's slam_data/loop_pose_<method>.txt
        # (loop_closing.cpp:66-67 opens it; :263-266 appends per accepted loop)
        self._log_path = None
        if data_path is not None:
            import os

            os.makedirs(data_path, exist_ok=True)
            self._log_path = os.path.join(data_path, f"loop_pose_{config.loop_method}.txt")
            open(self._log_path, "w").close()

    def update(self, kf_index: int, kf_pose, gnss_position=None) -> Optional[LoopPose]:
        """Called once per new keyframe (LoopClosing::Update,
        loop_closing.cpp:114-150). Returns an accepted LoopPose or None."""
        cfg = self.cfg
        kf_pose = np.asarray(kf_pose, np.float32)
        self.key_poses.append(kf_pose)
        self.key_gnss.append(
            kf_pose[:3, 3].copy() if gnss_position is None else np.asarray(gnss_position, np.float32)
        )

        rec = self.store.load(kf_index)
        if cfg.loop_method == "sc":
            self.sc.add(rec["points"], rec["mask"])

        # adaptive skip counter (loop_closing.cpp:152-168)
        self._skip_cnt += 1
        if self._skip_cnt < self._skip_num:
            return None

        if cfg.loop_method == "sc":
            cand, yaw = self._detect_scan_context(kf_index)
        else:
            cand, yaw = self._detect_gnss(kf_index)
        if cand < 0:
            return None
        self._skip_cnt = 0
        self._skip_num = cfg.loop_step

        loop = self._verify(cand, kf_index, yaw)
        if loop is not None:
            self.detected.append(loop)
            if self._log_path is not None:
                with open(self._log_path, "a") as f:
                    f.write(
                        f"loop {len(self.detected)}: frame {loop.index0} ------> "
                        f"frame {loop.index1}\nfitness score: {loop.fitness:.6f}\n\n"
                    )
        return loop

    # -- detectors ----------------------------------------------------------
    def _detect_gnss(self, cur: int):
        """DetectNearestKeyFrame (loop_closing.cpp:152-200)."""
        cfg = self.cfg
        if cur < cfg.diff_num:
            return -1, 0.0
        cur_p = self.key_gnss[cur]
        hist = np.asarray(self.key_gnss[: cur - cfg.diff_num + 1])
        if len(hist) == 0:
            return -1, 0.0
        d = np.abs(hist - cur_p).sum(axis=1)
        best = int(np.argmin(d))
        if d[best] > cfg.detect_area:
            # candidate too far: back off (reference grows the skip window
            # AND restarts the counter, loop_closing.cpp:219 — without the
            # reset the backoff would retry after only skip_num - old_cnt
            # keyframes)
            self._skip_cnt = 0
            self._skip_num = max(cfg.loop_step, int(d[best] / 2.0 / self.cfg.detect_area * cfg.loop_step))
            return -1, 0.0
        return best, 0.0

    def _detect_scan_context(self, cur: int):
        """DetectNearestKeyFrameScanContext (loop_closing.cpp:202-231):
        SC retrieval (temporal separation comes from the SC manager's
        num_exclude_recent window, not diff_num), then require the candidate
        to be at least extend_frame_num old and within detect_area of the
        current pose — backing the skip window off when it is far away."""
        cfg = self.cfg
        idx, dist, yaw = self.sc.detect()
        if idx < cfg.extend_frame_num:
            # a retrieval happened: restart the counter (loop_closing.cpp:219)
            self._skip_cnt = 0
            return -1, 0.0
        d = float(np.linalg.norm(self.key_poses[cur][:3, 3] - self.key_poses[idx][:3, 3]))
        if d > cfg.detect_area:
            # far candidate: reference resets the counter before applying the
            # detect_area/2 backoff (loop_closing.cpp:219) — both together
            # make the backoff effective
            self._skip_cnt = 0
            self._skip_num = max(int(cfg.detect_area / 2.0), cfg.loop_step)
            return -1, 0.0
        return idx, yaw

    # -- verification -------------------------------------------------------
    def _verify(self, index0: int, index1: int, yaw_hint: float) -> Optional[LoopPose]:
        """CloudRegistration: JointMap + JointScan + NDT + fitness gate
        (loop_closing.cpp:233-319)."""
        cfg = self.cfg

        # submap of +-extend_frame_num keyframes in their map poses
        pts_list, mask_list = [], []
        for k in range(
            max(0, index0 - cfg.extend_frame_num),
            min(len(self.key_poses), index0 + cfg.extend_frame_num + 1),
        ):
            rec = self.store.load(k)
            T = self.key_poses[k]
            p = rec["points"][rec["mask"]]
            pts_list.append(p @ T[:3, :3].T + T[:3, 3])
            mask_list.append(np.ones(len(p), bool))
        sub = np.concatenate(pts_list)
        # voxel-downsample FIRST, then bound to submap_capacity: truncating
        # the raw concatenation would drop tail keyframes wholesale instead
        # of thinning the whole submap. Raw capacity is bucketed to bound jit
        # recompiles across differently-sized submaps.
        bucket = 65536
        raw_cap = max(cfg.submap_capacity, ((len(sub) + bucket - 1) // bucket) * bucket)
        sub_pts = np.zeros((raw_cap, 3), np.float32)
        sub_pts[: len(sub)] = sub[:raw_cap]
        sub_msk = np.zeros(raw_cap, bool)
        sub_msk[: min(len(sub), raw_cap)] = True

        rec1 = self.store.load(index1)
        guess = self.key_poses[index1].copy()

        def align_and_score(g):
            pose, fit = _verify_step(
                jnp.asarray(sub_pts),
                jnp.asarray(sub_msk),
                jnp.asarray(rec1["points"]),
                jnp.asarray(rec1["mask"]),
                jnp.asarray(g),
                cfg,
            )
            # one batched fetch: pose + fitness in a single round trip
            pose, fit = jax.device_get((pose, fit))
            return np.asarray(pose), float(fit)

        result, fitness = align_and_score(guess)
        if fitness > cfg.fitness_score_limit and cfg.loop_method == "sc":
            # Fallback the reference lacks: odometry heading may have drifted
            # by the time the loop closes. Scan Context measured the TRUE
            # relative yaw between the two scans; apply only the DISCREPANCY
            # between that measurement and the relative yaw the pose
            # estimates imply (applying the raw SC yaw on top of a correct
            # heading breaks the guess). SC yaw resolution is one sector
            # (2*pi/60), so discrepancies below that are noise.
            R0 = self.key_poses[index0][:3, :3]
            R1 = guess[:3, :3]
            rel = R0.T @ R1
            rel_yaw = float(np.arctan2(rel[1, 0], rel[0, 0]))
            corr = (yaw_hint - rel_yaw + np.pi) % (2.0 * np.pi) - np.pi
            if abs(corr) > 2.0 * np.pi / 60.0:
                for sign in (1.0, -1.0):
                    g2 = guess.copy()
                    Rz = np.asarray(
                        euler_xyz_to_matrix(
                            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(sign * corr)
                        )
                    )
                    g2[:3, :3] = guess[:3, :3] @ Rz
                    r2, f2 = align_and_score(g2)
                    if f2 < fitness:
                        result, fitness = r2, f2
                    if fitness <= cfg.fitness_score_limit:
                        break
        if fitness > cfg.fitness_score_limit:
            return None
        rel = np.linalg.inv(self.key_poses[index0]) @ result
        return LoopPose(
            index0=index0, index1=index1, relative_pose=rel.astype(np.float32), fitness=fitness
        )

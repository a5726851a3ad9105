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
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..geom.se3 import euler_xyz_to_matrix
from ..io.keyframe_store import KeyframeStore
from ..models.registration import NDTConfig, build_ndt_map, ndt_align, ndt_fitness_score
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
    scan_filter_leaf: float = 0.5
    submap_capacity: int = 65536
    scan_capacity: int = 16384
    sc: ScanContextConfig = ScanContextConfig()


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
            # candidate too far: back off (reference grows the skip window)
            self._skip_num = max(cfg.loop_step, int(d[best] / 2.0 / self.cfg.detect_area * cfg.loop_step))
            return -1, 0.0
        return best, 0.0

    def _detect_scan_context(self, cur: int):
        """DetectNearestKeyFrameScanContext (loop_closing.cpp:202-231)."""
        idx, dist, yaw = self.sc.detect()
        if idx < 0 or cur - idx < self.cfg.diff_num:
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
        submap = PointCloud.from_points(sub, capacity=raw_cap)
        submap = voxel_downsample(submap, cfg.map_filter_leaf, out_capacity=cfg.submap_capacity)
        ndt_map = build_ndt_map(submap, cfg.ndt)

        rec1 = self.store.load(index1)
        scan = PointCloud(
            points=jnp.asarray(rec1["points"]),
            mask=jnp.asarray(rec1["mask"]),
        )
        scan = voxel_downsample(scan, cfg.scan_filter_leaf, out_capacity=cfg.scan_capacity)

        guess = self.key_poses[index1].copy()
        if cfg.loop_method == "sc" and abs(yaw_hint) > 1e-6:
            Rz = np.asarray(
                euler_xyz_to_matrix(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-yaw_hint))
            )
            guess[:3, :3] = guess[:3, :3] @ Rz

        result = ndt_align(ndt_map, scan, jnp.asarray(guess), cfg.ndt)
        fitness = float(ndt_fitness_score(ndt_map, scan, result.pose, cfg.ndt))
        if fitness > cfg.fitness_score_limit:
            return None
        rel = np.linalg.inv(self.key_poses[index0]) @ np.asarray(result.pose)
        return LoopPose(
            index0=index0, index1=index1, relative_pose=rel.astype(np.float32), fitness=fitness
        )

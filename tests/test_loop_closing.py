"""Loop-closing detection + verification semantics.

Covers the reference behaviors of loop_closing.cpp:202-319 on a hairpin
revisit drive:
- SC retrieval fires on a true revisit and the verification gate accepts it
  with the PCL-style point-NN squared fitness (ndt_registration.cpp:63-66);
- a wrong candidate pair is rejected by the same gate;
- a drifted odometry heading is recovered by the SC yaw-discrepancy
  fallback (an extension the reference lacks — it ignores the SC yaw).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.geom.se3 import euler_xyz_to_matrix
from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.models.registration import NDTConfig
from lidar_slam_tpu.models.scan_context import ScanContextConfig
from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig


@pytest.fixture(scope="module")
def hairpin(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loop_kf"))
    world = SyntheticWorld.corridor(length=50.0, width=14.0, density=25.0, seed=9)
    gt = make_hairpin_trajectory(n_out=10, n_turn=12, n_back=8, speed=1.0, turn_radius=1.0)
    store = KeyframeStore(root)
    cfg = LoopClosingConfig(
        loop_step=1,
        diff_num=12,
        extend_frame_num=2,
        ndt=NDTConfig(resolution=1.0, grid_dims=(96, 96, 24), point_chunk=2048, max_iter=25),
        submap_capacity=32768,
        scan_capacity=8192,
        sc=ScanContextConfig(num_exclude_recent=12),
    )
    lc = LoopClosing(cfg, store)
    loops = []
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(
            world, gt[i], t=i * 0.1, max_range=40.0, n_points=8192, seed=900 + i
        )
        kept = pts[mask]
        store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i * 0.1)
        loop = lc.update(i, gt[i])
        if loop is not None:
            loops.append(loop)
    return world, gt, lc, loops


class TestLoopClosing:
    def test_true_revisit_detected_and_accepted(self, hairpin):
        _, gt, _, loops = hairpin
        assert loops, "no loop accepted on a hairpin revisit"
        lp = loops[0]
        # index0 on the outbound leg, index1 on the return leg, both
        # spatially close (the hairpin offset is 2 m)
        assert lp.index1 - lp.index0 >= 12
        d = np.linalg.norm(gt[lp.index0][:3, 3] - gt[lp.index1][:3, 3])
        assert d < 10.0  # within the detect_area gate
        # PCL-fitness regime: every accepted loop passed the 0.2 gate and
        # the best straight-segment revisit scores far below it
        assert all(l.fitness <= 0.2 for l in hairpin[3])
        assert min(l.fitness for l in hairpin[3]) < 0.1

    def test_relative_pose_consistent_with_truth(self, hairpin):
        _, gt, _, loops = hairpin
        lp = loops[0]
        rel_gt = np.linalg.inv(gt[lp.index0]) @ gt[lp.index1]
        assert np.linalg.norm(lp.relative_pose[:3, 3] - rel_gt[:3, 3]) < 0.2

    def test_false_pair_rejected(self, hairpin):
        _, _, lc, _ = hairpin
        # outbound start vs mid-turn: ~8 m apart, disjoint views
        assert lc._verify(1, 14, 0.0) is None

    def test_yaw_discrepancy_fallback_recovers_drifted_heading(self, hairpin):
        _, gt, lc, loops = hairpin
        lp = loops[0]
        # corrupt the return-leg pose heading by 0.4 rad; the plain guess
        # then fails the gate, and the SC-yaw discrepancy retry recovers
        saved = lc.key_poses[lp.index1].copy()
        try:
            Rz = np.asarray(
                euler_xyz_to_matrix(jnp.float32(0), jnp.float32(0), jnp.float32(0.4))
            )
            bad = saved.copy()
            bad[:3, :3] = saved[:3, :3] @ Rz
            lc.key_poses[lp.index1] = bad
            rel = gt[lp.index0][:3, :3].T @ gt[lp.index1][:3, :3]
            true_yaw = float(np.arctan2(rel[1, 0], rel[0, 0]))
            out = lc._verify(lp.index0, lp.index1, true_yaw)
            assert out is not None, "yaw fallback failed to recover drifted heading"
            assert out.fitness < 0.2
        finally:
            lc.key_poses[lp.index1] = saved

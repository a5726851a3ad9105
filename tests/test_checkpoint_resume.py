"""Checkpoint/resume via the keyframe store (SURVEY §5.4 parity).

The reference's only recovery mechanism is its on-disk keyframe PCDs, wiped
on every startup (file_manager.cpp:23-29). Here the store is an explicit
resumable checkpoint: a mapping run can be continued, and localization-only
mode reuses a previous run's GNSS origin."""

import numpy as np
import pytest

from lidar_slam_tpu.io.keyframe_store import KeyframeStore


class TestKeyframeStoreResume:
    def test_roundtrip_and_resume(self, tmp_path):
        root = str(tmp_path / "run")
        rng = np.random.default_rng(0)
        s1 = KeyframeStore(root)
        for i in range(3):
            pts = rng.normal(size=(100, 3)).astype(np.float32)
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            s1.save(i, pts, np.ones(100, bool), pose, weights=np.full(100, 0.5, np.float32), time=i * 0.1)
        s1.save_origin(48.98, 8.39, 116.0)

        # resume: reopen WITHOUT wiping
        s2 = KeyframeStore(root, resume=True)
        assert len(s2) == 3
        rec = s2.load(1)
        assert rec["pose"][0, 3] == 1.0
        assert rec["points"].shape == (100, 3)
        np.testing.assert_allclose(rec["weights"], 0.5)
        origin = s2.load_origin()
        assert origin["lat"] == 48.98

        # continue appending after resume
        s2.save(3, rng.normal(size=(50, 3)).astype(np.float32), np.ones(50, bool), np.eye(4))
        assert len(s2) == 4

    def test_fresh_store_wipes(self, tmp_path):
        root = str(tmp_path / "run")
        s1 = KeyframeStore(root)
        s1.save(0, np.zeros((10, 3), np.float32), np.ones(10, bool), np.eye(4))
        s2 = KeyframeStore(root, resume=False)  # reference semantics: wipe
        assert len(s2) == 0

    def test_loop_closing_resumes_from_store(self, tmp_path):
        """A LoopClosing instance constructed over an existing store can
        verify candidates from keyframes written by an earlier session."""
        from lidar_slam_tpu.io import SyntheticWorld, simulate_scan, make_trajectory
        from lidar_slam_tpu.models.registration import NDTConfig
        from lidar_slam_tpu.pipeline import LoopClosing, LoopClosingConfig

        root = str(tmp_path / "slam")
        world = SyntheticWorld.corridor(length=40, seed=1)
        gt = make_trajectory(6, speed=1.0)
        store = KeyframeStore(root)
        for i in range(6):
            pts, mask, _ = simulate_scan(world, gt[i], n_points=4096, max_range=30.0, seed=i)
            store.save(i, pts, mask, gt[i], time=i * 0.1)

        # "new session": resume the store, rebuild detector state
        store2 = KeyframeStore(root, resume=True)
        lc = LoopClosing(
            LoopClosingConfig(
                loop_method="gps",
                loop_step=1,
                diff_num=3,
                detect_area=3.0,
                extend_frame_num=1,
                fitness_score_limit=0.4,
                ndt=NDTConfig(grid_dims=(64, 64, 16), point_chunk=2048, max_iter=15),
                submap_capacity=8192,
                scan_capacity=4096,
            ),
            store=store2,
        )
        # replay keyframe metadata, then present a revisit of keyframe 0
        for i in range(6):
            lc.update(i, gt[i], gnss_position=gt[i][:3, 3])
        pts, mask, _ = simulate_scan(world, gt[0], n_points=4096, max_range=30.0, seed=99)
        store2.save(6, pts, mask, gt[0], time=0.7)
        loop = lc.update(6, gt[0], gnss_position=gt[0][:3, 3])
        assert loop is not None
        assert loop.index1 == 6 and loop.index0 <= 2
        # relative pose ~ identity composed difference (same place)
        assert np.linalg.norm(loop.relative_pose[:3, 3] - (np.linalg.inv(gt[loop.index0]) @ gt[0])[:3, 3]) < 0.5

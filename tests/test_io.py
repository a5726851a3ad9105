import os

import numpy as np
import pytest

from lidar_slam_tpu.io import (
    KittiOdometryReader,
    KittiRawReader,
    read_velodyne_bin,
    write_kitti_trajectory,
    read_kitti_trajectory,
    ate_rmse,
    rpe,
    SyntheticWorld,
    simulate_scan,
    make_trajectory,
)


class TestTrajectory:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(4), (10, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(10, 3))
        p = tmp_path / "traj.txt"
        write_kitti_trajectory(str(p), poses)
        back = read_kitti_trajectory(str(p))
        np.testing.assert_allclose(back, poses, atol=1e-6)

    def test_ate_zero_for_identical(self):
        poses = np.tile(np.eye(4), (20, 1, 1))
        poses[:, 0, 3] = np.arange(20)
        assert ate_rmse(poses, poses) < 1e-9

    def test_ate_alignment_removes_rigid_offset(self):
        poses = np.tile(np.eye(4), (20, 1, 1))
        poses[:, 0, 3] = np.arange(20)
        shifted = poses.copy()
        shifted[:, 1, 3] += 5.0  # constant offset, removable by alignment
        assert ate_rmse(shifted, poses, align=True) < 1e-6
        assert ate_rmse(shifted, poses, align=False) > 4.9

    def test_rpe(self):
        poses = np.tile(np.eye(4), (10, 1, 1))
        poses[:, 0, 3] = np.arange(10)
        drift = poses.copy()
        drift[:, 0, 3] = np.arange(10) * 1.1  # 10% scale drift
        t_err, r_err = rpe(drift, poses)
        assert abs(t_err - 0.1) < 1e-6
        assert r_err < 1e-6


class TestKittiReaders:
    def _make_raw_fixture(self, root):
        drive = os.path.join(root, "2011_10_03", "2011_10_03_drive_0027_sync")
        os.makedirs(os.path.join(drive, "velodyne_points", "data"))
        os.makedirs(os.path.join(drive, "oxts", "data"))
        rng = np.random.default_rng(0)
        for i in range(3):
            scan = rng.normal(size=(100, 4)).astype(np.float32)
            scan.tofile(os.path.join(drive, "velodyne_points", "data", f"{i:010d}.bin"))
            oxts = np.zeros(30)
            oxts[0] = 48.98 + i * 1e-5  # lat
            oxts[1] = 8.39  # lon
            oxts[2] = 116.0
            oxts[5] = 0.1 * i  # yaw
            np.savetxt(os.path.join(drive, "oxts", "data", f"{i:010d}.txt"), oxts[None])
        for sub in ["velodyne_points", "oxts"]:
            with open(os.path.join(drive, sub, "timestamps.txt"), "w") as f:
                for i in range(3):
                    f.write(f"2011-10-03 12:00:0{i}.500000000\n")
        with open(os.path.join(root, "2011_10_03", "calib_imu_to_velo.txt"), "w") as f:
            f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0.1 0 0\n")
        return drive

    def test_raw_reader(self, tmp_path):
        drive = self._make_raw_fixture(str(tmp_path))
        reader = KittiRawReader(drive)
        frames = list(reader)
        assert len(frames) == 3
        assert frames[0]["points"].shape == (100, 3)
        # first frame anchors ENU origin at ~0
        np.testing.assert_allclose(frames[0]["gnss_pose"][:3, 3], 0, atol=1e-6)
        # later frames move north ~1.11 m per 1e-5 deg
        assert abs(frames[2]["gnss_pose"][1, 3] - 2.22) < 0.05
        assert frames[1]["time"] == pytest.approx(1.0)
        assert reader.T_imu_to_velo[0, 3] == pytest.approx(0.1)

    def test_odometry_reader(self, tmp_path):
        root = str(tmp_path)
        seq = os.path.join(root, "sequences", "00")
        os.makedirs(os.path.join(seq, "velodyne"))
        os.makedirs(os.path.join(root, "poses"))
        rng = np.random.default_rng(1)
        for i in range(2):
            rng.normal(size=(50, 4)).astype(np.float32).tofile(
                os.path.join(seq, "velodyne", f"{i:06d}.bin")
            )
        np.savetxt(os.path.join(seq, "times.txt"), np.arange(2) * 0.1)
        gt = np.tile(np.eye(4)[:3], (2, 1, 1)).reshape(2, -1)
        np.savetxt(os.path.join(root, "poses", "00.txt"), gt)
        reader = KittiOdometryReader(root, "00")
        frames = list(reader)
        assert len(frames) == 2
        assert frames[1]["gt_pose"].shape == (4, 4)


class TestSynthetic:
    def test_world_and_scan(self):
        world = SyntheticWorld.corridor(length=60, seed=0)
        poses = make_trajectory(5, speed=1.5)
        pts, mask, bboxes = simulate_scan(world, poses[0], n_points=4096, seed=0)
        assert pts.shape == (4096, 3)
        assert mask.sum() > 3000
        r = np.linalg.norm(pts[mask], axis=1)
        assert r.min() >= 1.8 and r.max() <= 61.0

    def test_scan_consistency_across_poses(self):
        """Points from two poses, mapped back to world, overlap closely."""
        world = SyntheticWorld.corridor(length=60, seed=1)
        poses = make_trajectory(3, speed=2.0)
        a, ma, _ = simulate_scan(world, poses[0], n_points=4096, noise=0.0, seed=2)
        aw = a[ma] @ poses[0][:3, :3].T + poses[0][:3, 3]
        # all world-frame points should be near some world point
        from scipy.spatial import cKDTree  # scipy is in the base image

        d, _ = cKDTree(world.points).query(aw, k=1)
        assert np.percentile(d, 95) < 0.05

    def test_dynamic_box(self):
        world = SyntheticWorld.corridor(length=40, seed=3)
        world.add_moving_box([20.0, 0.0, 1.0], [4.0, 2.0, 1.5], 0.3, [1.0, 0.0])
        poses = make_trajectory(2, speed=1.0)
        _, _, bb0 = simulate_scan(world, poses[0], t=0.0, seed=4)
        _, _, bb1 = simulate_scan(world, poses[1], t=1.0, seed=5)
        assert bb0.shape == (1, 8)
        # box moved 1 m in world x; sensor moved 1 m too -> relative x ~ same,
        # but world-frame center advanced:
        assert abs((bb1[0, 0] + poses[1][0, 3]) - (bb0[0, 0] + poses[0][0, 3]) - 1.0) < 0.2

"""KITTI-layout golden end-to-end regression.

The reference's entire verification oracle is replaying a KITTI raw drive
(kitti_test/readme.md:17-30) and judging the trajectory files the back end
writes in KITTI 3x4 row-major format (back_end.cpp:149-169). This test
recreates that oracle against real KITTI-formatted bytes: a synthetic world
with a revisit loop and dynamic objects is exported as a KITTI raw *_sync
tree (velodyne .bin + oxts + timestamps + calib + per-frame bbox txts), then
`python -m lidar_slam_tpu mapping --kitti-raw` drives readers -> front end ->
back end -> loop closing -> viewer from disk, and we assert:

  * odometry ATE against the (withheld) ground truth is bounded,
  * >= 1 loop closure is found on the revisit,
  * graph optimization (GNSS priors + loop edges) does not worsen keyframe
    ATE vs raw odometry,
  * the map + trajectory artifacts exist and parse.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory
from lidar_slam_tpu.io.kitti import KittiRawReader
from lidar_slam_tpu.io.kitti_writer import read_bbox_dir, write_kitti_raw_drive
from lidar_slam_tpu.io.synthetic import bboxes_for, simulate_spinning_scan
from lidar_slam_tpu.io.trajectory import ate_rmse


def _make_drive(tmp_path, n_azimuth=512, gnss_noise=0.15, scan_noise=0.02):
    """Drive frames come from the HDL-64 beam-table spinning simulator
    (64 true elevation angles via the A-LOAM ring formulas, azimuth-ordered
    returns, per-cell occlusion) — the realistic scan distribution the
    reference's KITTI oracle provides (scanRegistration.cpp:169-205)."""
    world = SyntheticWorld.corridor(length=90, seed=7, curve=0.0)
    # one parked-then-moving truck: dynamic bboxes flow through the writer's
    # bbox channel into the front end's static-weighting path
    world.add_moving_box(
        center0=(22.0, 2.0, 1.0), size=(4.0, 2.0, 2.0), heading=0.0,
        velocity=(0.8, 0.0), n_points=200,
    )
    gt = make_hairpin_trajectory(n_out=16, n_turn=24, n_back=14, speed=1.0, turn_radius=1.0)
    rng = np.random.default_rng(11)
    frames = []
    for i in range(len(gt)):
        pts, mask = simulate_spinning_scan(
            world, gt[i], t=i * 0.1, n_scans=64, n_azimuth=n_azimuth,
            max_range=35.0, min_range=2.0, noise=scan_noise, seed=500 + i,
        )
        bboxes = bboxes_for(world, gt[i], t=i * 0.1)
        gnss_pose = gt[i].copy().astype(np.float64)
        gnss_pose[:3, 3] += rng.normal(0, gnss_noise, 3)
        frames.append(
            {
                "points": pts[mask],
                "pose": gnss_pose,
                "time": i * 0.1,
                "bboxes": bboxes,
            }
        )
    drive_dir = write_kitti_raw_drive(str(tmp_path / "kitti_raw"), frames)
    return world, gt, frames, drive_dir


class TestKittiRoundTrip:
    def test_writer_reader_roundtrip(self, tmp_path):
        """Bytes written in KITTI layout decode back to the same scans/poses."""
        _, gt, frames, drive_dir = _make_drive(tmp_path, n_azimuth=256, gnss_noise=0.0)
        reader = KittiRawReader(drive_dir)
        assert len(reader) == len(gt)
        got = list(reader)
        # translations are re-anchored at the first fix; rotations exact
        for i in (0, 10, len(gt) - 1):
            f = got[i]
            np.testing.assert_allclose(f["points"], frames[i]["points"], atol=1e-5)
            np.testing.assert_allclose(
                f["gnss_pose"][:3, :3], gt[i][:3, :3], atol=2e-4
            )
            np.testing.assert_allclose(
                f["gnss_pose"][:3, 3],
                gt[i][:3, 3] - gt[0][:3, 3],
                atol=2e-3,
            )
            assert abs(f["time"] - i * 0.1) < 1e-6
        # bbox channel round-trips next to the drive
        bbox_dir = os.path.join(os.path.dirname(drive_dir), "bbox", "0001")
        assert os.path.isdir(bbox_dir)
        b5 = read_bbox_dir(bbox_dir, 5)
        assert b5 is not None and b5.shape[1] == 8
        np.testing.assert_allclose(b5, frames[5]["bboxes"], rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestKittiGoldenE2E:
    def test_mapping_kitti_raw_golden(self, tmp_path):
        # noisy sparse scans so odometry drifts measurably — the loop/GNSS
        # optimization must then demonstrably pull keyframes back toward truth
        _, gt, _, drive_dir = _make_drive(
            tmp_path, n_azimuth=512, gnss_noise=0.10, scan_noise=0.06
        )
        out_dir = str(tmp_path / "run")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        launcher = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from lidar_slam_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))"
        )
        r = subprocess.run(
            [
                sys.executable, "-c", launcher, "mapping",
                "--kitti-raw", drive_dir, "--out", out_dir,
                "--config", "configs/synthetic_small.yaml",
            ],
            capture_output=True, text=True, env=env, cwd=repo, timeout=1800,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

        # ground truth in the reader's frame: re-anchored at the first fix
        gt_anchored = gt.copy()
        gt_anchored[:, :3, 3] -= gt[0, :3, 3]

        odom = np.loadtxt(os.path.join(out_dir, "trajectory", "laser_odom.txt"))
        odom = np.concatenate(
            [odom.reshape(-1, 3, 4), np.tile([[[0, 0, 0, 1.0]]], (len(odom), 1, 1))], axis=1
        )
        assert len(odom) == len(gt)
        ate_odo = ate_rmse(odom, gt_anchored)
        assert ate_odo < 0.8, f"odometry ATE {ate_odo:.3f} m through the KITTI path"

        # loop closure fired on the revisit leg
        assert "loop closure:" in r.stdout, r.stdout[-2000:]

        # optimized keyframes exist and do not degrade vs raw odometry
        opt_path = os.path.join(out_dir, "trajectory", "optimized.txt")
        assert os.path.exists(opt_path)
        opt = np.loadtxt(opt_path)
        opt = np.concatenate(
            [opt.reshape(-1, 3, 4), np.tile([[[0, 0, 0, 1.0]]], (len(opt), 1, 1))], axis=1
        )
        kf_dir = os.path.join(out_dir, "key_frames")
        kf_files = sorted(
            (f for f in os.listdir(kf_dir) if f.endswith(".npz")),
            key=lambda f: int(f.split("_")[-1][:-4]),
        )
        kf_times = [float(np.load(os.path.join(kf_dir, f))["time"]) for f in kf_files]
        kf_idx = np.asarray([int(round(t / 0.1)) for t in kf_times])
        assert len(opt) == len(kf_idx)
        ate_opt = ate_rmse(opt, gt_anchored[kf_idx])
        ate_kf_odo = ate_rmse(odom[kf_idx], gt_anchored[kf_idx])
        print(f"keyframe ATE: odometry {ate_kf_odo:.3f} m, optimized {ate_opt:.3f} m")
        assert ate_opt <= ate_kf_odo + 0.02, (
            f"optimization worsened keyframe ATE: {ate_opt:.3f} vs {ate_kf_odo:.3f}"
        )
        assert ate_opt < 0.5, f"optimized ATE {ate_opt:.3f} m"

        # map artifact parses
        with np.load(os.path.join(out_dir, "map", "filtered_map.npz")) as z:
            assert len(z["points"]) > 1000

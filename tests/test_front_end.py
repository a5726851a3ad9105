import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.io import SyntheticWorld, simulate_scan, make_trajectory, ate_rmse
from lidar_slam_tpu.models.registration import NDTConfig
from lidar_slam_tpu.pipeline import FrontEnd, FrontEndConfig

CFG = FrontEndConfig(
    ndt=NDTConfig(resolution=1.0, grid_dims=(96, 96, 24), point_chunk=2048, max_iter=25),
    frame_capacity=8192,
    keyframe_capacity=8192,
    local_frame_num=10,
)


def run_odometry(n_frames=30, speed=1.0, with_dynamic=False, n_points=8192, seed=0):
    world = SyntheticWorld.corridor(length=80, seed=seed, curve=0.004)
    if with_dynamic:
        world.add_moving_box([15.0, 2.0, 0.9], [4.0, 1.8, 1.6], 0.0, [-2.0, 0.0], n_points=250)
        world.add_moving_box([30.0, -2.0, 0.9], [4.0, 1.8, 1.6], 0.0, [2.5, 0.0], n_points=250)
    gt = make_trajectory(n_frames, speed=speed, curve=0.004)
    fe = FrontEnd(CFG)
    fe.set_init_pose(gt[0])
    est = []
    for i in range(n_frames):
        pts, mask, bboxes = simulate_scan(
            world, gt[i], t=i * 0.1, max_range=35.0, n_points=n_points, seed=100 + i
        )
        pose, is_kf = fe.update(pts, jnp.asarray(mask), bboxes=bboxes if with_dynamic else None)
        est.append(pose)
    return np.stack(est), gt


class TestFrontEndOdometry:
    def test_static_world_tracking(self):
        est, gt = run_odometry(n_frames=25, speed=1.0)
        ate = ate_rmse(est, gt, align=False)
        # per-frame motion 1 m; requirement: stay locked on (well under a voxel)
        assert ate < 0.35, f"ATE {ate}"
        # end-point drift bounded
        end_err = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert end_err < 0.6, f"end error {end_err}"

    def test_keyframes_created(self):
        est, gt = run_odometry(n_frames=12, speed=1.0)
        # 12 m of travel at 2 m gate -> ~6 keyframes expected


class TestFrontEndDrive:
    def test_drive_matches_stepwise(self):
        """front_end_drive (whole sequence in one lax.scan program) tracks the
        same trajectory as per-frame FrontEnd.update (no bboxes)."""
        import jax.numpy as jnp

        from lidar_slam_tpu.pipeline.front_end import (
            front_end_drive,
            init_front_end_drive,
        )

        world = SyntheticWorld.corridor(length=60, seed=5, curve=0.0)
        gt = make_trajectory(14, speed=1.0)
        frames = [
            simulate_scan(world, gt[i], t=i * 0.1, max_range=35.0, n_points=8192, seed=700 + i)[:2]
            for i in range(14)
        ]

        fe = FrontEnd(CFG)
        fe.set_init_pose(gt[0])
        step_poses = []
        step_kf = []
        for pts, mask in frames:
            pose, is_kf = fe.update(pts, jnp.asarray(mask))
            step_poses.append(pose)
            step_kf.append(is_kf)

        cap = CFG.raw_capacity
        pts_seq = np.zeros((14, cap, 3), np.float32)
        msk_seq = np.zeros((14, cap), bool)
        for i, (pts, mask) in enumerate(frames):
            n = len(pts)
            pts_seq[i, :n] = pts
            msk_seq[i, :n] = mask
        st = init_front_end_drive(CFG, init_pose=gt[0])
        st, poses, kfs, unres = front_end_drive(
            st, jnp.asarray(pts_seq), jnp.asarray(msk_seq), CFG
        )
        poses = np.asarray(poses)
        assert float(np.max(np.asarray(unres))) == 0.0
        assert list(np.asarray(kfs)) == step_kf
        for i in range(14):
            np.testing.assert_allclose(
                poses[i][:3, 3], step_poses[i][:3, 3], atol=5e-3, err_msg=f"frame {i}"
            )


class TestStaticWeighting:
    def test_dynamic_objects_downweighted(self):
        """Keyframe clouds must carry ~0 weights inside moving boxes."""
        world = SyntheticWorld.corridor(length=60, seed=3)
        world.add_moving_box([12.0, 1.0, 0.9], [4.0, 1.8, 1.6], 0.0, [-3.0, 0.0], n_points=300)
        gt = make_trajectory(8, speed=1.0)
        fe = FrontEnd(CFG)
        fe.set_init_pose(gt[0])
        for i in range(8):
            pts, mask, bboxes = simulate_scan(
                world, gt[i], t=i * 1.0, max_range=35.0, n_points=8192, seed=300 + i
            )
            fe.update(pts, jnp.asarray(mask), bboxes=bboxes)
        assert fe.n_keyframes >= 3
        # inspect the newest keyframe's weights: points inside the box region
        # should be downweighted (box moved 3 m/s between keyframes -> d large)
        slot = (fe.kf_cursor - 1) % CFG.local_frame_num
        w = np.asarray(fe.kf_weights[slot])
        m = np.asarray(fe.kf_masks[slot])
        assert (w[m] < 0.5).sum() > 20, "no points downweighted"
        assert (w[m] > 0.99).sum() > 1000, "static points should keep weight 1"

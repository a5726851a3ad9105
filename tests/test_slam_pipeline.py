import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.io import (
    SyntheticWorld,
    simulate_scan,
    make_trajectory,
    make_hairpin_trajectory,
    ate_rmse,
)
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.models.registration import NDTConfig
from lidar_slam_tpu.models.scan_context import ScanContextConfig
from lidar_slam_tpu.models.graph_optimizer import GraphOptimizerConfig
from lidar_slam_tpu.pipeline import (
    FrontEnd,
    FrontEndConfig,
    BackEnd,
    BackEndConfig,
    LoopClosing,
    LoopClosingConfig,
    Viewer,
    ViewerConfig,
    Matching,
    MatchingConfig,
)

FE_CFG = FrontEndConfig(
    ndt=NDTConfig(resolution=1.0, grid_dims=(96, 96, 24), point_chunk=2048, max_iter=25),
    frame_capacity=8192,
    keyframe_capacity=8192,
    local_frame_num=10,
)


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    """One full mapping run on a loop trajectory, shared by several tests."""
    root = str(tmp_path_factory.mktemp("slam_data"))
    world = SyntheticWorld.corridor(length=90, seed=7, curve=0.0)
    n_frames = 60
    gt = make_hairpin_trajectory(n_out=16, n_turn=24, n_back=14, speed=1.0, turn_radius=1.0)

    store = KeyframeStore(root)
    fe = FrontEnd(FE_CFG)
    fe.set_init_pose(gt[0])
    be = BackEnd(
        BackEndConfig(
            optimize_step_with_loop=1,
            optimize_step_with_key_frame=1000,
            optimize_step_with_gnss=1000,
            gnss_noise=(1.0, 1.0, 1.0),
            optimizer=GraphOptimizerConfig(max_iterations=50),
        ),
        store=store,
    )
    lc = LoopClosing(
        LoopClosingConfig(
            loop_method="gps",
            loop_step=1,
            diff_num=8,
            detect_area=6.0,
            extend_frame_num=1,
            fitness_score_limit=0.35,
            ndt=NDTConfig(resolution=1.0, grid_dims=(96, 96, 24), point_chunk=2048, max_iter=25),
            submap_capacity=16384,
            scan_capacity=8192,
            sc=ScanContextConfig(num_exclude_recent=8),
        ),
        store=store,
    )
    viewer = Viewer(ViewerConfig(local_frame_num=10), store)

    rng = np.random.default_rng(0)
    est = []
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(world, gt[i], t=i * 0.1, max_range=35.0, n_points=8192, seed=500 + i)
        pose, _ = fe.update(pts, jnp.asarray(mask))
        est.append(pose)
        gnss = gt[i][:3, 3] + rng.normal(0, 0.3, 3).astype(np.float32)
        frame_for_store = pts[mask][:8192]
        new_kf = be.update(
            pose,
            time=i * 0.1,
            gnss_position=gnss,
            cloud_points=frame_for_store,
            cloud_mask=np.ones(len(frame_for_store), bool),
        )
        if new_kf:
            kf = be.latest_keyframe()
            viewer.update_with_new_key_frame(kf.index, kf.pose)
            loop = lc.update(kf.index, kf.pose, gnss_position=gnss)
            if loop is not None:
                be.insert_loop_pose(loop.index0, loop.index1, loop.relative_pose)
            if be.has_new_optimized():
                viewer.update_with_optimized_poses(be.get_optimized_poses())
    be.force_optimize()
    viewer.update_with_optimized_poses(be.get_optimized_poses())
    return dict(
        world=world, gt=gt, est=np.stack(est), be=be, lc=lc, viewer=viewer, store=store
    )


class TestMappingPipeline:
    def test_odometry_tracks(self, slam_run):
        ate = ate_rmse(slam_run["est"], slam_run["gt"], align=False)
        assert ate < 1.0, ate

    def test_keyframes_and_graph(self, slam_run):
        be = slam_run["be"]
        assert len(be.key_frames) >= 10
        assert be.graph.n_edges >= len(be.key_frames) - 1
        assert be.graph.n_priors == len(be.key_frames)

    def test_loop_detected_and_optimized(self, slam_run):
        lc = slam_run["lc"]
        be = slam_run["be"]
        assert len(lc.detected) >= 1, "no loop closures found on a revisit path"
        stats = be.last_stats
        assert stats is not None
        assert stats["chi2_after"] <= stats["chi2_before"]

    def test_optimized_keyframes_beat_or_match_odometry(self, slam_run):
        be, gt = slam_run["be"], slam_run["gt"]
        kf_times = [kf.time for kf in be.key_frames]
        frame_idx = [int(round(t / 0.1)) for t in kf_times]
        gt_kf = gt[frame_idx]
        odom_kf = np.stack([kf.pose for kf in be.key_frames])
        opt_kf = be.get_optimized_poses()
        ate_odom = ate_rmse(odom_kf, gt_kf, align=False)
        ate_opt = ate_rmse(opt_kf, gt_kf, align=False)
        assert ate_opt < max(ate_odom * 1.05, 0.5), (ate_odom, ate_opt)

    def test_viewer_map_export(self, slam_run, tmp_path):
        viewer = slam_run["viewer"]
        out = viewer.save_map()
        assert out["map_points"] > 1000
        assert out["filtered_map_points"] > 500
        import os

        assert os.path.exists(os.path.join(slam_run["store"].map_dir, "filtered_map.npz"))
        assert os.path.exists(os.path.join(slam_run["store"].map_dir, "map.pcd"))


class TestMatchingLocalization:
    def test_localize_in_prebuilt_map(self, slam_run):
        viewer = slam_run["viewer"]
        world, gt = slam_run["world"], slam_run["gt"]
        gmap = viewer.get_global_map(filtered=True)
        cfg = MatchingConfig(
            ndt=NDTConfig(resolution=1.0, grid_dims=(128, 128, 24), point_chunk=2048, max_iter=25),
            box_size=120.0,
            local_map_capacity=1 << 16,
            frame_capacity=8192,
        )
        matcher = Matching(cfg, gmap)
        matcher.set_gnss_pose(gt[2])
        errs = []
        for i in range(2, 12):
            pts, mask, _ = simulate_scan(world, gt[i], n_points=8192, max_range=35.0, seed=900 + i)
            pose = matcher.update(pts, jnp.asarray(mask))
            errs.append(np.linalg.norm(pose[:3, 3] - gt[i][:3, 3]))
        assert np.mean(errs) < 0.5, errs

    def test_yaw_init_only_position(self, slam_run):
        viewer = slam_run["viewer"]
        world, gt = slam_run["world"], slam_run["gt"]
        gmap = viewer.get_global_map(filtered=True)
        cfg = MatchingConfig(
            ndt=NDTConfig(resolution=1.0, grid_dims=(128, 128, 24), point_chunk=2048, max_iter=25),
            box_size=120.0,
            local_map_capacity=1 << 16,
            frame_capacity=8192,
            init_mode="only_position",
            height_map_dim=128,
        )
        matcher = Matching(cfg, gmap)
        i = 5
        pts, mask, _ = simulate_scan(world, gt[i], n_points=8192, max_range=35.0, seed=950)
        assert matcher.update(pts, jnp.asarray(mask)) is None  # buffers the scan
        pos = gt[i][:3, 3]
        ok1 = matcher.set_gnss_pose(pos)
        ok2 = matcher.set_gnss_pose(pos)
        assert ok2, "yaw estimates should agree across two calls"
        yaw_est = np.arctan2(matcher.current_pose[1, 0], matcher.current_pose[0, 0])
        yaw_gt = np.arctan2(gt[i][1, 0], gt[i][0, 0])
        d = abs((yaw_est - yaw_gt + np.pi) % (2 * np.pi) - np.pi)
        assert d < 0.1, (yaw_est, yaw_gt)

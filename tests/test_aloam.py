import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.io import (
    SyntheticWorld,
    simulate_spinning_scan,
    make_trajectory,
    ate_rmse,
)
from lidar_slam_tpu.pipeline.aloam import (
    FeatureExtractionConfig,
    extract_features,
    AloamOdometry,
    AloamOdometryConfig,
    AloamMapping,
    AloamMappingConfig,
)

FE = FeatureExtractionConfig(
    n_scans=64,
    min_range=2.5,
    capacity=65536,
    max_sharp=512,
    max_less_sharp=4096,
    max_flat=1024,
    max_less_flat=8192,
)


def spin(world, pose, t=0.0, seed=0):
    pts, mask = simulate_spinning_scan(
        world, pose, t=t, n_scans=64, n_azimuth=1024, max_range=45.0, seed=seed
    )
    return jnp.asarray(pts), jnp.asarray(mask)


@pytest.fixture(scope="module")
def corridor():
    return SyntheticWorld.corridor(length=80, seed=11)


class TestFeatureExtraction:
    def test_counts_and_structure(self, corridor):
        pose = make_trajectory(1)[0]
        pts, mask = spin(corridor, pose, seed=1)
        f = extract_features(pts, mask, FE)
        n_sharp = int(f.sharp.num_valid())
        n_lsharp = int(f.less_sharp.num_valid())
        n_flat = int(f.flat.num_valid())
        n_lflat = int(f.less_flat.num_valid())
        # 64 rings x 6 sectors x caps bound the counts
        assert 0 < n_sharp <= 64 * 6 * 2
        assert n_sharp <= n_lsharp <= 64 * 6 * 20
        assert 0 < n_flat <= 64 * 6 * 4
        assert n_lflat > n_flat
        # corners should sit on facade depth discontinuities / poles — high
        # curvature; flats on ground/walls. Sanity: flat points' z spread is
        # dominated by ground returns near z = -1.8 (sensor at 1.8 m)
        fp = np.asarray(f.flat.points)[np.asarray(f.flat.mask)]
        assert fp.shape[0] == n_flat

    def test_ring_ids_match_elevation(self, corridor):
        pose = make_trajectory(1)[0]
        pts, mask = spin(corridor, pose, seed=2)
        f = extract_features(pts, mask, FE)
        m = np.asarray(f.sharp.mask)
        rings = np.asarray(f.sharp_ring)[m]
        assert rings.min() >= 0 and rings.max() < 64


class TestOdometry:
    def test_tracks_straight_motion(self, corridor):
        gt = make_trajectory(8, speed=1.0)
        odo = AloamOdometry(AloamOdometryConfig(chunk=1024))
        est = []
        for i in range(8):
            pts, mask = spin(corridor, gt[i], seed=20 + i)
            f = extract_features(pts, mask, FE)
            est.append(gt[0] @ odo.update(f))  # odometry is relative to frame 0
        est = np.stack(est)
        # relative translation per frame should be ~1 m in x
        d = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert d < 0.5, (d, est[-1][:3, 3], gt[-1][:3, 3])

    def test_recovers_rotation(self, corridor):
        gt = make_trajectory(6, speed=1.0, curve=0.05)
        odo = AloamOdometry(AloamOdometryConfig(chunk=1024))
        for i in range(6):
            pts, mask = spin(corridor, gt[i], seed=40 + i)
            f = extract_features(pts, mask, FE)
            pose = gt[0] @ odo.update(f)
        yaw_est = np.arctan2(pose[1, 0], pose[0, 0])
        yaw_gt = np.arctan2(gt[5][1, 0], gt[5][0, 0])
        assert abs(yaw_est - yaw_gt) < 0.05, (yaw_est, yaw_gt)


class TestMapping:
    def test_scan_to_map_refines(self, corridor):
        gt = make_trajectory(10, speed=1.2)
        odo = AloamOdometry(AloamOdometryConfig(chunk=1024))
        mapping = AloamMapping(
            AloamMappingConfig(
                corner_map_capacity=16384,
                surf_map_capacity=32768,
                grid_dims=(96, 96, 16),
                chunk=1024,
            )
        )
        est_odom, est_map = [], []
        for i in range(10):
            pts, mask = spin(corridor, gt[i], seed=60 + i)
            f = extract_features(pts, mask, FE)
            T_odom = gt[0] @ odo.update(f)
            T_map = mapping.update(f, T_odom)
            est_odom.append(T_odom)
            est_map.append(T_map)
        ate_map = ate_rmse(np.stack(est_map), gt, align=False)
        ate_odom = ate_rmse(np.stack(est_odom), gt, align=False)
        assert ate_map < 0.4, (ate_map, ate_odom)
        # mapping should not be (much) worse than raw odometry
        assert ate_map <= ate_odom * 1.5 + 0.05


class TestFusedPipeline:
    def test_matches_staged_stages(self, corridor):
        """aloam_step (one device program per sweep) == the staged
        AloamOdometry + AloamMapping wrappers, pose for pose."""
        from lidar_slam_tpu.pipeline.aloam import (
            AloamPipeline,
            extract_features,
        )

        traj = make_trajectory(5, speed=0.8)
        sweeps = [spin(corridor, traj[i], t=i * 0.1, seed=100 + i) for i in range(5)]

        odo_cfg = AloamOdometryConfig()
        map_cfg = AloamMappingConfig(
            corner_map_capacity=16384, surf_map_capacity=32768
        )
        odo = AloamOdometry(odo_cfg)
        mapping = AloamMapping(map_cfg)
        staged = []
        for pts, mask in sweeps:
            f = extract_features(pts, mask, FE)
            T_odom = odo.update(f)
            staged.append(mapping.update(f, T_odom))

        pipe = AloamPipeline(FE, odo_cfg, map_cfg)
        fused = []
        for pts, mask in sweeps:
            import numpy as _np

            p = _np.asarray(pts)
            m = _np.asarray(mask)
            pose, _ = pipe.update(p, m)
            fused.append(pose)

        # same algorithm, different XLA fusion partitioning: float rounding
        # differences get amplified by discrete correspondence flips across
        # sweeps, so equality is to mm-level, not bitwise
        for i, (a, b) in enumerate(zip(staged, fused)):
            np.testing.assert_allclose(b, a, atol=5e-3, err_msg=f"sweep {i}")

    def test_scan_chained_drive_matches_stepwise(self, corridor):
        """aloam_drive (all sweeps in one lax.scan program) == per-sweep
        aloam_step dispatches, pose for pose."""
        from lidar_slam_tpu.pipeline.aloam import AloamPipeline

        traj = make_trajectory(4, speed=0.8)
        sweeps = [
            (np.asarray(s[0]), np.asarray(s[1]))
            for s in (spin(corridor, traj[i], t=i * 0.1, seed=300 + i) for i in range(4))
        ]
        map_cfg = AloamMappingConfig(corner_map_capacity=16384, surf_map_capacity=32768)

        step = AloamPipeline(FE, AloamOdometryConfig(), map_cfg)
        stepwise = [step.update(p, m)[0] for p, m in sweeps]

        chained = AloamPipeline(FE, AloamOdometryConfig(), map_cfg)
        batch = chained.update_batch(sweeps)
        for i in range(4):
            np.testing.assert_allclose(batch[i], stepwise[i], atol=5e-3, err_msg=f"sweep {i}")

    def test_tracks_motion(self, corridor):
        from lidar_slam_tpu.pipeline.aloam import AloamPipeline

        traj = make_trajectory(6, speed=0.8)
        pipe = AloamPipeline(
            FE,
            AloamOdometryConfig(),
            AloamMappingConfig(corner_map_capacity=16384, surf_map_capacity=32768),
        )
        pipe.set_init_pose(traj[0])
        errs = []
        for i in range(6):
            pts, mask = spin(corridor, traj[i], t=i * 0.1, seed=200 + i)
            pose, _ = pipe.update(np.asarray(pts), np.asarray(mask))
            errs.append(np.linalg.norm(pose[:3, 3] - traj[i][:3, 3]))
        assert np.mean(errs[1:]) < 0.25, errs

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.ops import PointCloud
from lidar_slam_tpu.models.ground_seg import GroundSegConfig, segment_ground
from lidar_slam_tpu.models.clustering import SLRConfig, slr_cluster, cluster_sizes
from lidar_slam_tpu.models.scan_adjust import DistortionConfig, adjust_cloud
from lidar_slam_tpu.models.cloud_filter import make_cloud_filter, VoxelFilter, BoxFilter, NoFilter
from lidar_slam_tpu.models.registration.factory import make_registration, NDTRegistration
from lidar_slam_tpu.models.registration import NDTConfig
from lidar_slam_tpu.pipeline.data_pretreat import (
    DataPretreat,
    DataPretreatConfig,
    lever_arm_velocity,
    interp_quat,
    StampedQuat,
)


class TestGroundSeg:
    def test_separates_ground_from_poles(self):
        rng = np.random.default_rng(0)
        n_g, n_p = 3000, 600
        ground = np.stack(
            [rng.uniform(-20, 20, n_g), rng.uniform(-20, 20, n_g), rng.normal(-1.8, 0.03, n_g)],
            axis=-1,
        ).astype(np.float32)
        poles = np.stack(
            [rng.uniform(-20, 20, n_p), rng.uniform(-20, 20, n_p), rng.uniform(-1.5, 2.0, n_p)],
            axis=-1,
        ).astype(np.float32)
        cloud = PointCloud.from_points(np.concatenate([ground, poles]))
        g, ng = segment_ground(cloud, GroundSegConfig(sensor_height=1.8))
        g, ng = np.asarray(g), np.asarray(ng)
        assert g[:n_g].mean() > 0.95  # ground recognized
        above = poles[:, 2] > -1.3
        assert ng[n_g:][above].mean() > 0.9  # pole shafts kept as non-ground

    def test_spurious_below_ground_excluded(self):
        pts = np.array([[0, 0, -5.0], [1, 1, -1.8]], np.float32)
        cloud = PointCloud.from_points(pts)
        g, ng = segment_ground(cloud, GroundSegConfig(sensor_height=1.8, num_lpr=1))
        assert not bool(g[0]) and not bool(ng[0])


class TestSLRClustering:
    def test_two_separated_objects(self):
        """Organized mini-sweep: 4 rings x 64 azimuth bins, two box-like
        clusters of returns separated in azimuth."""
        n_rings, n_az = 4, 64
        pts = np.zeros((n_rings * n_az, 3), np.float32)
        mask = np.zeros(n_rings * n_az, bool)
        ring = np.repeat(np.arange(n_rings), n_az).astype(np.int32)
        for r in range(n_rings):
            for a in range(5, 15):  # object A
                pts[r * n_az + a] = [5.0 + 0.01 * a, 0.1 * a, 0.2 * r]
                mask[r * n_az + a] = True
            for a in range(40, 50):  # object B, far away
                pts[r * n_az + a] = [-8.0 - 0.01 * a, -0.1 * a, 0.2 * r]
                mask[r * n_az + a] = True
        labels = np.asarray(
            slr_cluster(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ring), n_az, SLRConfig(n_scans=4))
        )
        la = labels[0 * n_az + 5 : 0 * n_az + 15]
        lb = labels[0 * n_az + 40 : 0 * n_az + 50]
        assert len(set(la.tolist())) == 1
        assert len(set(lb.tolist())) == 1
        assert la[0] != lb[0]
        # cross-ring merge: ring 3's object-A points share ring 0's label
        assert labels[3 * n_az + 7] == la[0]


class TestScanAdjust:
    def test_rotation_compensation(self):
        """A sweep rotating at w about z: a point captured at half sweep
        should de-rotate by w * T/2."""
        n = 8
        az = np.linspace(0, 2 * np.pi * (n - 1) / n, n)
        pts = np.stack([10 * np.cos(az), 10 * np.sin(az), np.zeros(n)], axis=-1).astype(np.float32)
        w = np.asarray([0.0, 0.0, 0.5], np.float32)  # rad/s
        out = np.asarray(
            adjust_cloud(jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(w), jnp.zeros(3), DistortionConfig(0.1))
        )
        # first point unchanged; later points rotated back by -w*t
        np.testing.assert_allclose(out[0], pts[0], atol=1e-5)
        t_half = 0.5 * 0.1
        ang = -0.5 * t_half
        c, s = np.cos(ang), np.sin(ang)
        expected = np.array([c * pts[4, 0] - s * pts[4, 1], s * pts[4, 0] + c * pts[4, 1], 0.0])
        np.testing.assert_allclose(out[4], expected, atol=1e-4)


class TestFilters:
    def test_factory(self):
        assert isinstance(make_cloud_filter("voxel", leaf_size=0.5), VoxelFilter)
        assert isinstance(make_cloud_filter("box", origin=[0, 0, 0], size=[2, 2, 2]), BoxFilter)
        assert isinstance(make_cloud_filter("no"), NoFilter)
        with pytest.raises(ValueError):
            make_cloud_filter("bogus")

    def test_box_filter_masks(self):
        cloud = PointCloud.from_points(np.array([[0, 0, 0], [5, 0, 0]], np.float32))
        out = make_cloud_filter("box", origin=[0, 0, 0], size=[2, 2, 2]).filter(cloud)
        assert list(np.asarray(out.mask)) == [True, False]


class TestRegistrationFactory:
    def test_strategies(self):
        assert isinstance(make_registration("NDTMANUAL"), NDTRegistration)
        assert isinstance(make_registration("NDT"), NDTRegistration)
        r = make_registration("ICPMANUAL")
        assert r.cfg.mode == "point_to_point"
        r2 = make_registration("ICPPLANE")
        assert r2.cfg.mode == "point_to_plane"
        with pytest.raises(ValueError):
            make_registration("WHAT")

    def test_ndt_interface_roundtrip(self):
        rng = np.random.default_rng(1)
        pts = np.concatenate(
            [c + rng.normal(0, 0.2, (40, 3)).astype(np.float32) for c in rng.uniform(-8, 8, (20, 3)).astype(np.float32)]
        )
        reg = make_registration("NDTMANUAL", config=NDTConfig(grid_dims=(32, 32, 16), point_chunk=512))
        reg.set_input_target(PointCloud.from_points(pts))
        src = PointCloud.from_points(pts[:200] + np.float32([0.2, 0.0, 0.0]))
        pose, score = reg.scan_match(src, np.eye(4))
        assert abs(pose[0, 3] + 0.2) < 0.1
        assert np.isfinite(reg.get_fitness_score())


class TestDataPretreat:
    def test_sync_and_pose(self):
        dp = DataPretreat(DataPretreatConfig())
        for t in [0.0, 0.1, 0.2]:
            dp.add_imu(t, [1, 0, 0, 0])
            dp.add_gnss(t, 48.98 + t * 1e-4, 8.39, 116.0)
        out0 = dp.process(0.05, np.zeros((10, 3), np.float32))
        out1 = dp.process(0.15, np.zeros((10, 3), np.float32))
        assert out0 is not None and out1 is not None
        # origin anchors at the first processed frame -> its ENU is ~0
        assert abs(out0["gnss_pose"][1, 3]) < 1e-6
        # 0.1 s later: dlat = 1e-5 deg ~ 1.11 m north
        assert abs(out1["gnss_pose"][1, 3] - 1.11) < 0.05

    def test_out_of_window_returns_none(self):
        dp = DataPretreat(DataPretreatConfig())
        dp.add_imu(0.0, [1, 0, 0, 0])
        dp.add_gnss(0.0, 48.98, 8.39, 116.0)
        assert dp.process(1.0, np.zeros((5, 3), np.float32)) is None

    def test_lever_arm_cross_product_exact(self):
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 0.5]  # lidar offset from imu
        v, w = lever_arm_velocity([1.0, 0, 0], [0, 0, 0.3], T)
        np.testing.assert_allclose(w, [0, 0, 0.3], atol=1e-9)
        # v + w x r with r = [1,2,0.5]: w x r = [-0.6, 0.3, 0]
        np.testing.assert_allclose(v, [1 - 0.6, 0.3, 0.0], atol=1e-9)

    def test_quat_interp_shortest_path(self):
        recs = [
            StampedQuat(0.0, np.array([1.0, 0, 0, 0])),
            StampedQuat(1.0, np.array([-0.999, 0.04, 0, 0])),  # ~same rotation, negated
        ]
        q = interp_quat(recs, 0.5)
        assert abs(np.linalg.norm(q) - 1) < 1e-6
        assert abs(abs(q[0]) - 1) < 0.01  # stays near identity, no wild path


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        from lidar_slam_tpu.config import load_config

        p = tmp_path / "cfg.yaml"
        p.write_text(
            """
front_end:
  key_frame_distance: 3.5
  ndt:
    resolution: 2.0
    max_iter: 10
back_end:
  gnss_noise: [1.0, 1.0, 9.0]
"""
        )
        cfg = load_config(str(p))
        assert cfg.front_end.key_frame_distance == 3.5
        assert cfg.front_end.ndt.resolution == 2.0
        assert cfg.front_end.ndt.max_iter == 10
        assert cfg.back_end.gnss_noise == (1.0, 1.0, 9.0)
        # untouched defaults survive
        assert cfg.matching.box_size == 200.0

    def test_unknown_key_raises(self, tmp_path):
        from lidar_slam_tpu.config import load_config

        p = tmp_path / "bad.yaml"
        p.write_text("front_end:\n  bogus_key: 1\n")
        with pytest.raises(KeyError):
            load_config(str(p))

    def test_overrides(self):
        from lidar_slam_tpu.config import load_config

        cfg = load_config(overrides={"front_end": {"local_frame_num": 7}})
        assert cfg.front_end.local_frame_num == 7

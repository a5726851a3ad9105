import numpy as np
import jax.numpy as jnp

from lidar_slam_tpu.ops import PointCloud
from lidar_slam_tpu.geom import se3_exp, se3_log, pose_inverse, transform_points
from lidar_slam_tpu.models.registration import (
    ICPConfig,
    prepare_icp_target,
    icp_align,
    estimate_normals,
)


def make_box_scene(n=3000, seed=0):
    """Points on the faces of a 20x20x4 box — full 6-DoF constraint."""
    rng = np.random.default_rng(seed)
    per = n // 6
    pts = []
    for ax, val in [(0, -10), (0, 10), (1, -10), (1, 10), (2, 0), (2, 4)]:
        p = rng.uniform(-10, 10, size=(per, 3)).astype(np.float32)
        p[:, 2] = rng.uniform(0, 4, size=per)
        p[:, ax] = val
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


class TestICPPointToPoint:
    def test_recovers_transform(self):
        pts = make_box_scene()
        target = PointCloud.from_points(pts)
        cfg = ICPConfig(grid_dims=(32, 32, 16), max_corr_dist=1.5, chunk=1024)
        prepared = prepare_icp_target(target, cfg, origin=jnp.asarray([-24.0, -24.0, -12.0]))

        xi = jnp.asarray([0.3, -0.2, 0.1, 0.01, 0.02, -0.03], jnp.float32)
        T_true = se3_exp(xi)
        rng = np.random.default_rng(1)
        sel = rng.choice(len(pts), 1000, replace=False)
        src = PointCloud(
            points=transform_points(pose_inverse(T_true), jnp.asarray(pts[sel])),
            mask=jnp.ones(len(sel), bool),
        )
        res = icp_align(prepared, src, jnp.eye(4), cfg)
        err = np.asarray(se3_log(pose_inverse(T_true) @ res.pose))
        assert np.abs(err[:3]).max() < 0.05, err
        assert np.abs(err[3:]).max() < 0.01, err
        assert float(res.fitness) < 0.05


class TestICPPointToPlane:
    def test_recovers_transform_fewer_iters(self):
        pts = make_box_scene(seed=2)
        target = PointCloud.from_points(pts)
        cfg = ICPConfig(
            mode="point_to_plane", grid_dims=(32, 32, 16), max_corr_dist=1.5, chunk=1024
        )
        prepared = prepare_icp_target(target, cfg, origin=jnp.asarray([-24.0, -24.0, -12.0]))

        xi = jnp.asarray([0.4, -0.3, 0.15, 0.02, -0.02, 0.04], jnp.float32)
        T_true = se3_exp(xi)
        rng = np.random.default_rng(3)
        sel = rng.choice(len(pts), 1000, replace=False)
        src = PointCloud(
            points=transform_points(pose_inverse(T_true), jnp.asarray(pts[sel])),
            mask=jnp.ones(len(sel), bool),
        )
        res = icp_align(prepared, src, jnp.eye(4), cfg)
        err = np.asarray(se3_log(pose_inverse(T_true) @ res.pose))
        assert np.abs(err[:3]).max() < 0.02, err
        assert np.abs(err[3:]).max() < 0.005, err

    def test_static_weights_downweight_outliers(self):
        """Moving 'dynamic object' points with weight ~0 should not corrupt
        the estimate — the core promise of static-point weighting."""
        pts = make_box_scene(seed=4)
        target = PointCloud.from_points(pts)
        cfg = ICPConfig(
            mode="point_to_plane", grid_dims=(32, 32, 16), max_corr_dist=1.5, chunk=1024
        )
        prepared = prepare_icp_target(target, cfg, origin=jnp.asarray([-24.0, -24.0, -12.0]))

        xi = jnp.asarray([0.2, -0.1, 0.05, 0.0, 0.0, 0.02], jnp.float32)
        T_true = se3_exp(xi)
        rng = np.random.default_rng(5)
        sel = rng.choice(len(pts), 800, replace=False)
        static_src = np.asarray(transform_points(pose_inverse(T_true), jnp.asarray(pts[sel])))
        # dynamic cluster: copies of target surface shifted sideways 0.8 m
        dyn = pts[rng.choice(len(pts), 200)] + np.array([0.8, 0.4, 0.0], np.float32)
        src_pts = np.concatenate([static_src, dyn])
        weights = np.concatenate([np.ones(800, np.float32), np.zeros(200, np.float32)])
        src = PointCloud(
            points=jnp.asarray(src_pts), mask=jnp.ones(1000, bool), weights=jnp.asarray(weights)
        )
        res = icp_align(prepared, src, jnp.eye(4), cfg)
        err = np.asarray(se3_log(pose_inverse(T_true) @ res.pose))
        assert np.abs(err[:3]).max() < 0.03, err

        # sanity: without weights the dynamic points bias the fit more
        src_nw = PointCloud(points=jnp.asarray(src_pts), mask=jnp.ones(1000, bool))
        res_nw = icp_align(prepared, src_nw, jnp.eye(4), cfg)
        err_nw = np.asarray(se3_log(pose_inverse(T_true) @ res_nw.pose))
        assert np.abs(err_nw[:3]).max() > np.abs(err[:3]).max()


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(6)
        p = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
        p[:, 2] = 0.0
        cloud = PointCloud.from_points(p)
        cfg = ICPConfig(grid_dims=(16, 16, 8), max_corr_dist=2.0)
        from lidar_slam_tpu.ops import build_bucket_grid

        grid = build_bucket_grid(cloud, 2.0, (16, 16, 8), origin=jnp.asarray([-16.0, -16.0, -8.0]))
        normals, good = estimate_normals(cloud, grid, k=8, radius=2.0, chunk=512)
        normals = np.asarray(normals)[np.asarray(good)]
        assert len(normals) > 400
        nz = np.abs(normals[:, 2])
        assert (nz > 0.99).mean() > 0.95

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.geom import se3_exp, se3_log, pose_inverse
from lidar_slam_tpu.models.graph_optimizer import (
    GraphOptimizerConfig,
    PoseGraphBuilder,
    graph_chi2,
    optimize_pose_graph,
)


def build_noisy_loop(n=30, drift=0.02, seed=0, with_loop=True, with_gnss=False,
                     max_nodes=64, max_edges=128, max_priors=64):
    """Circular trajectory with drifting odometry; ground truth + builder."""
    rng = np.random.default_rng(seed)
    # ground truth: circle of n poses
    gt = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        R = np.array(
            [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
        )
        t = np.array([10 * np.cos(theta), 10 * np.sin(theta), 0.0])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        gt.append(T)
    gt = np.stack(gt).astype(np.float32)

    # odometry measurements with noise -> integrated initial guesses
    builder = PoseGraphBuilder(max_nodes, max_edges, max_priors)
    est = [gt[0]]
    builder.add_se3_node(gt[0], fixed=not with_gnss)
    for i in range(1, n):
        Z = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise_xi = rng.normal(0, drift, 6).astype(np.float32) * np.array([1, 1, 0.2, 0.1, 0.1, 1], np.float32)
        Zn = np.asarray(se3_exp(jnp.asarray(noise_xi))) @ Z
        est.append(est[-1] @ Zn)
        builder.add_se3_node(est[-1])
        builder.add_se3_edge(i - 1, i, Zn, noise=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01])
    if with_loop:
        Z_loop = np.linalg.inv(gt[n - 1]) @ gt[0]
        builder.add_se3_edge(n - 1, 0, Z_loop, noise=[0.3, 0.3, 0.3, 0.01, 0.01, 0.01])
    if with_gnss:
        for i in range(0, n, 3):
            builder.add_se3_prior_xyz_edge(i, gt[i][:3, 3], noise=[2.0, 2.0, 2.0])
    return builder, gt, np.stack(est)


class TestPoseGraph:
    def test_chi2_zero_on_consistent_graph(self):
        builder, gt, _ = build_noisy_loop(n=10, drift=0.0)
        chi2 = float(graph_chi2(builder.to_graph()))
        assert chi2 < 1e-6

    def test_loop_closure_reduces_drift(self):
        builder, gt, est0 = build_noisy_loop(n=30, drift=0.02)
        drift_before = np.linalg.norm(est0[-1][:3, 3] - gt[-1][:3, 3])
        graph, stats = builder.optimize(GraphOptimizerConfig(max_iterations=50))
        poses = np.asarray(graph.poses)[: builder.n_nodes]
        assert float(stats["chi2_after"]) < float(stats["chi2_before"]) * 0.1
        drift_after = np.linalg.norm(poses[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_after < drift_before * 0.5

    def test_gnss_priors_pin_absolute_frame(self):
        builder, gt, est0 = build_noisy_loop(n=24, drift=0.03, with_loop=False, with_gnss=True)
        graph, stats = builder.optimize(GraphOptimizerConfig(max_iterations=50))
        poses = np.asarray(graph.poses)[: builder.n_nodes]
        err = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
        err0 = np.linalg.norm(est0[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert err.mean() < err0.mean() * 0.7
        assert err.max() < 2.0

    def test_pcg_matches_dense(self):
        builder, gt, _ = build_noisy_loop(n=20, drift=0.02, seed=3)
        g_dense, s_dense = optimize_pose_graph(
            builder.to_graph(), GraphOptimizerConfig(max_iterations=30, solver="dense")
        )
        g_pcg, s_pcg = optimize_pose_graph(
            builder.to_graph(), GraphOptimizerConfig(max_iterations=30, solver="pcg")
        )
        n = builder.n_nodes
        d = np.asarray(g_dense.poses)[:n, :3, 3]
        p = np.asarray(g_pcg.poses)[:n, :3, 3]
        assert float(s_pcg["chi2_after"]) < float(s_pcg["chi2_before"]) * 0.2
        np.testing.assert_allclose(d, p, atol=0.05)

    def test_huber_resists_outlier_loop(self):
        builder, gt, _ = build_noisy_loop(n=24, drift=0.015, seed=5)
        # inject a wildly wrong loop edge
        bad = np.eye(4, dtype=np.float32)
        bad[:3, 3] = [5.0, -3.0, 1.0]
        builder.add_se3_edge(5, 15, bad, noise=[0.5, 0.5, 0.5, 0.1, 0.1, 0.1])
        cfg_plain = GraphOptimizerConfig(max_iterations=40)
        cfg_huber = GraphOptimizerConfig(max_iterations=40, robust_kernel="huber", robust_delta=1.0)
        g_plain, _ = optimize_pose_graph(builder.to_graph(), cfg_plain)
        g_huber, _ = optimize_pose_graph(builder.to_graph(), cfg_huber)
        n = builder.n_nodes
        err_plain = np.linalg.norm(np.asarray(g_plain.poses)[:n, :3, 3] - gt[:, :3, 3], axis=1).mean()
        err_huber = np.linalg.norm(np.asarray(g_huber.poses)[:n, :3, 3] - gt[:, :3, 3], axis=1).mean()
        assert err_huber <= err_plain


class TestQuatPrior:
    def test_quat_prior_jacobian_matches_finite_difference(self):
        """Analytic dvec(q)/dphi vs central differences on a random pose."""
        from lidar_slam_tpu.geom.se3 import matrix_to_quat
        from lidar_slam_tpu.models.graph_optimizer import _prior_residuals_jacobians

        rng = np.random.default_rng(3)
        xi = rng.normal(0, 0.5, 6).astype(np.float32)
        T = np.asarray(se3_exp(jnp.asarray(xi)))
        builder = PoseGraphBuilder(4, 4, 4)
        builder.add_se3_node(T)
        q_meas = np.asarray(matrix_to_quat(jnp.asarray(T[:3, :3] @ T[:3, :3])))
        builder.add_se3_prior_quat_edge(0, q_meas, noise=[0.1, 0.1, 0.1])
        g = builder.to_graph()
        r, J = _prior_residuals_jacobians(g)
        r0 = np.asarray(r)[0]
        J0 = np.asarray(J)[0]  # [3, 6]
        eps = 1e-4
        for a in range(6):
            dp = np.zeros(6, np.float32)
            dp[a] = eps
            Tp = T @ np.asarray(se3_exp(jnp.asarray(dp)))
            Tm = T @ np.asarray(se3_exp(jnp.asarray(-dp)))
            rp, _ = _prior_residuals_jacobians(g.replace(poses=jnp.asarray(Tp)[None]))
            rm, _ = _prior_residuals_jacobians(g.replace(poses=jnp.asarray(Tm)[None]))
            fd = (np.asarray(rp)[0] - np.asarray(rm)[0]) / (2 * eps)
            np.testing.assert_allclose(J0[:, a], fd, atol=2e-3)

    def test_quat_priors_pin_orientation(self):
        """With only odometry + orientation priors, the absolute yaw drift
        at the loop end shrinks (EdgeSE3PriorQuat semantics)."""
        from lidar_slam_tpu.geom.se3 import matrix_to_quat

        builder, gt, est0 = build_noisy_loop(n=20, drift=0.03, with_loop=False, with_gnss=True)
        for i in range(0, 20, 2):
            q = np.asarray(matrix_to_quat(jnp.asarray(gt[i][:3, :3])))
            builder.add_se3_prior_quat_edge(i, q, noise=[0.05, 0.05, 0.05])
        g, stats = optimize_pose_graph(builder.to_graph(), GraphOptimizerConfig())
        poses = np.asarray(g.poses)
        rot_err_before = []
        rot_err_after = []
        for i in range(20):
            def angerr(R):
                c = (np.trace(gt[i][:3, :3].T @ R) - 1) / 2
                return np.arccos(np.clip(c, -1, 1))
            rot_err_before.append(angerr(est0[i][:3, :3]))
            rot_err_after.append(angerr(poses[i][:3, :3]))
        assert np.mean(rot_err_after) < 0.5 * np.mean(rot_err_before) + 1e-4

    def test_builder_grows_past_initial_capacity(self):
        builder = PoseGraphBuilder(max_nodes=4, max_edges=4, max_priors=2)
        T = np.eye(4, dtype=np.float32)
        for i in range(10):
            builder.add_se3_node(T, fixed=(i == 0))
        for i in range(9):
            builder.add_se3_edge(i, i + 1, T, noise=[1, 1, 1, 1, 1, 1])
        for i in range(5):
            builder.add_se3_prior_xyz_edge(i, T[:3, 3], noise=[1, 1, 1])
        assert builder.max_nodes >= 10 and builder.max_edges >= 9 and builder.max_priors >= 5
        g, stats = optimize_pose_graph(builder.to_graph(), GraphOptimizerConfig())
        assert float(stats["chi2_after"]) < 1e-6

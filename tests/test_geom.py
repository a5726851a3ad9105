import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.geom import (
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    quat_to_matrix,
    matrix_to_quat,
    pose_inverse,
    make_pose,
    transform_points,
    geodetic_to_enu,
)


def random_rotvecs(n, scale=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3)).astype(np.float32) * scale / 3.0


class TestSO3:
    def test_exp_is_rotation(self):
        w = random_rotvecs(64)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_log_roundtrip(self):
        w = random_rotvecs(64, scale=1.5)
        w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_identity_safe(self):
        R = so3_exp(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        w = so3_log(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)

    def test_tiny_angle(self):
        w = jnp.asarray([1e-6, -2e-6, 3e-7])
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-8)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        xi = np.concatenate(
            [rng.normal(size=(32, 3)) * 2.0, random_rotvecs(32, 1.5, seed=2)], axis=-1
        ).astype(np.float32)
        xi2 = np.asarray(se3_log(se3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_inverse(self):
        xi = jnp.asarray([0.5, -1.0, 2.0, 0.1, -0.2, 0.3])
        T = se3_exp(xi)
        eye = np.asarray(T @ pose_inverse(T))
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-5)

    def test_transform_points(self):
        T = make_pose(so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2])), jnp.asarray([1.0, 0.0, 0.0]))
        p = jnp.asarray([[1.0, 0.0, 0.0]])
        out = np.asarray(transform_points(T, p))
        np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


class TestEuler:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        rpy = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
        R = euler_zyx_to_matrix(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        r, p, y = matrix_to_euler_zyx(R)
        np.testing.assert_allclose(np.asarray(r), rpy[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(p), rpy[:, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), rpy[:, 2], atol=1e-5)

    def test_matches_composed_axis_rotations(self):
        r, p, y = 0.3, -0.4, 1.1
        Rx = np.asarray(so3_exp(jnp.asarray([r, 0, 0], jnp.float32)))
        Ry = np.asarray(so3_exp(jnp.asarray([0, p, 0], jnp.float32)))
        Rz = np.asarray(so3_exp(jnp.asarray([0, 0, y], jnp.float32)))
        expected = Rz @ Ry @ Rx
        got = np.asarray(euler_zyx_to_matrix(jnp.float32(r), jnp.float32(p), jnp.float32(y)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestQuat:
    def test_roundtrip(self):
        w = random_rotvecs(64, 2.5, seed=4)
        R = so3_exp(jnp.asarray(w))
        R2 = quat_to_matrix(matrix_to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


class TestENU:
    def test_origin_is_zero(self):
        enu = geodetic_to_enu(48.98, 8.39, 116.4, 48.98, 8.39, 116.4)
        np.testing.assert_allclose(enu, 0.0, atol=1e-9)

    def test_small_northward_step(self):
        # ~1.11 m per 1e-5 deg latitude
        enu = geodetic_to_enu(48.98001, 8.39, 116.4, 48.98, 8.39, 116.4)
        assert abs(enu[1] - 1.11) < 0.02
        assert abs(enu[0]) < 1e-3
        assert abs(enu[2]) < 1e-4

    def test_eastward_step_scales_with_cos_lat(self):
        enu = geodetic_to_enu(48.98, 8.39001, 116.4, 48.98, 8.39, 116.4)
        expected_east = 1.1132 * np.cos(np.deg2rad(48.98))
        assert abs(enu[0] - expected_east) < 0.02

"""SO(3)/SE(3) utilities as pure jax.numpy functions.

Replaces the reference's scattered use of Eigen (quaternions, angle-axis) and
Sophus (icp_registration_manual.cpp SE(3) exp-update) with one jit-safe module.
All functions are shape-polymorphic over leading batch dims where noted and are
safe at the identity (Taylor guards around theta ~ 0).

Poses are represented as 4x4 homogeneous float32 matrices (`T`), matching the
reference's `Eigen::Matrix4f` convention (e.g. front_end.cpp `Update`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w):
    """Skew-symmetric matrix of w: hat(w) @ v == cross(w, v). Batched over leading dims."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues formula: axis-angle vector [..., 3] -> rotation matrix [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    # Taylor-safe coefficients: sin(t)/t and (1-cos(t))/t^2.
    use_taylor = theta2 < _EPS
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    K = so3_hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """Rotation matrix [..., 3, 3] -> axis-angle vector [..., 3].

    Uses the standard trace formula with a Taylor guard near the identity.
    Accurate for theta < pi - eps (sufficient for incremental SLAM updates).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of (R - R^T) / 2 = sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    # theta/sin(theta) ~ 1 + theta^2/6 near 0
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_theta))
    return v * scale[..., None]


def se3_exp(xi):
    """Twist [..., 6] (rho, phi) -> 4x4 transform. rho = translation part, phi = rotation."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    use_taylor = theta2 < _EPS
    # V = I + (1-cos)/t^2 K + (t - sin)/t^3 K^2
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    c = jnp.where(
        use_taylor,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS * _EPS * _EPS),
    )
    K = so3_hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_pose(R, t)


def se3_log(T):
    """4x4 transform -> twist [..., 6] (rho, phi)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    use_taylor = theta2 < _EPS
    K = so3_hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^{-1} = I - K/2 + (1/t^2 - (1+cos)/(2 t sin)) K^2
    half_theta = theta * 0.5
    cot_term = jnp.where(
        use_taylor,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.maximum(theta2, _EPS * _EPS))
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * jnp.sin(theta), _EPS),
    )
    Vinv = eye - 0.5 * K + cot_term[..., None, None] * (K @ K)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def euler_zyx_to_matrix(roll, pitch, yaw):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) — matches Magnusson-NDT / Eigen
    eulerAngles(2,1,0) convention used in the reference's manual NDT
    (NormalDistributionsTransform.cpp computeAngleDerivatives)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_zyx(R):
    """Inverse of euler_zyx_to_matrix -> (roll, pitch, yaw). Gimbal-safe clamp on pitch."""
    sp = -R[..., 2, 0]
    pitch = jnp.arcsin(jnp.clip(sp, -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def euler_xyz_to_matrix(rx, ry, rz):
    """R = Rx(rx) @ Ry(ry) @ Rz(rz) — the Eigen `eulerAngles(0,1,2)` /
    AngleAxisX*AngleAxisY*AngleAxisZ convention the reference's manual NDT
    optimizes over (NormalDistributionsTransform.cpp:334-336,371-374)."""
    ca, sa = jnp.cos(rx), jnp.sin(rx)
    cb, sb = jnp.cos(ry), jnp.sin(ry)
    cc, sc = jnp.cos(rz), jnp.sin(rz)
    row0 = jnp.stack([cb * cc, -cb * sc, sb], axis=-1)
    row1 = jnp.stack([ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb], axis=-1)
    row2 = jnp.stack([sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_xyz(R):
    """Inverse of euler_xyz_to_matrix -> (rx, ry, rz)."""
    ry = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    rx = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    rz = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return rx, ry, rz


def quat_to_matrix(q):
    """Quaternion [..., 4] as (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), branch-free Shepperd variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    q0 = jnp.stack([qw0, (m21 - m12), (m02 - m20), (m10 - m01)], axis=-1)
    q0 = q0.at[..., 1:].multiply((0.25 / jnp.maximum(qw0, _EPS))[..., None])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    q1 = jnp.stack([(m21 - m12), qx1, (m01 + m10), (m02 + m20)], axis=-1)
    s1 = 0.25 / jnp.maximum(qx1, _EPS)
    q1 = jnp.concatenate([q1[..., :1] * s1[..., None], q1[..., 1:2], q1[..., 2:] * s1[..., None]], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    q2 = jnp.stack([(m02 - m20), (m01 + m10), qy2, (m12 + m21)], axis=-1)
    s2 = 0.25 / jnp.maximum(qy2, _EPS)
    q2 = jnp.concatenate(
        [q2[..., :1] * s2[..., None], q2[..., 1:2] * s2[..., None], q2[..., 2:3], q2[..., 3:] * s2[..., None]],
        axis=-1,
    )

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    q3 = jnp.stack([(m10 - m01), (m02 + m20), (m12 + m21), qz3], axis=-1)
    s3 = 0.25 / jnp.maximum(qz3, _EPS)
    q3 = jnp.concatenate([q3[..., :3] * s3[..., None], q3[..., 3:]], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None], axis=-2)[..., 0, :]
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def make_pose(R, t):
    """Assemble [..., 4, 4] from [..., 3, 3] and [..., 3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def pose_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def pose_compose(A, B):
    return A @ B


def transform_points(T, points):
    """Apply [4,4] (or batched) transform to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]

from .se3 import (
    so3_exp,
    so3_log,
    so3_hat,
    se3_exp,
    se3_log,
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    quat_to_matrix,
    matrix_to_quat,
    pose_inverse,
    pose_compose,
    transform_points,
    make_pose,
)
from .enu import geodetic_to_enu, LocalCartesian

__all__ = [
    "so3_exp",
    "so3_log",
    "so3_hat",
    "se3_exp",
    "se3_log",
    "euler_zyx_to_matrix",
    "matrix_to_euler_zyx",
    "quat_to_matrix",
    "matrix_to_quat",
    "pose_inverse",
    "pose_compose",
    "transform_points",
    "make_pose",
    "geodetic_to_enu",
    "LocalCartesian",
]

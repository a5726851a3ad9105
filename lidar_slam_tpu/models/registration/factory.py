"""Registration strategy objects behind one interface.

Mirrors the reference's RegistrationInterface
(include/.../models/registration/registration_interface.hpp:13-26 —
{SetInputTarget, ScanMatch, GetFitnessScore}) and its string-keyed strategy
selection (front_end.cpp:58-75: NDT | NDTMANUAL | ICP | ICPMANUAL).

In this framework the "manual" and "PCL wrapper" variants collapse into one
TPU implementation each: `NDT`/`NDTMANUAL` -> models/registration/ndt.py,
`ICP`/`ICPMANUAL` -> models/registration/icp.py (plus the point-to-plane
superset as `ICPPLANE`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...ops.pointcloud import PointCloud
from .icp import ICPConfig, icp_align, prepare_icp_target
from .ndt import NDTConfig, build_ndt_map, ndt_align, ndt_fitness_score


class RegistrationInterface:
    def set_input_target(self, cloud: PointCloud) -> None:
        raise NotImplementedError

    def scan_match(self, source: PointCloud, predict_pose) -> Tuple[np.ndarray, float]:
        """Returns (result_pose [4,4], score-like scalar)."""
        raise NotImplementedError

    def get_fitness_score(self) -> float:
        raise NotImplementedError


class NDTRegistration(RegistrationInterface):
    def __init__(self, config: NDTConfig = NDTConfig()):
        self.cfg = config
        self.ndt_map = None
        self._last_source: Optional[PointCloud] = None
        self._last_pose: Optional[np.ndarray] = None

    def set_input_target(self, cloud: PointCloud) -> None:
        self.ndt_map = build_ndt_map(cloud, self.cfg)

    def scan_match(self, source: PointCloud, predict_pose):
        result = ndt_align(self.ndt_map, source, jnp.asarray(predict_pose, jnp.float32), self.cfg)
        self._last_source = source
        self._last_pose = np.asarray(result.pose)
        return self._last_pose, float(result.trans_probability)

    def get_fitness_score(self, max_range: float = 4.0) -> float:
        if self._last_source is None:
            return float("inf")
        return float(
            ndt_fitness_score(
                self.ndt_map, self._last_source, jnp.asarray(self._last_pose), self.cfg, max_range
            )
        )


class ICPRegistration(RegistrationInterface):
    def __init__(self, config: ICPConfig = ICPConfig()):
        self.cfg = config
        self.target = None
        self._last_fitness = float("inf")

    def set_input_target(self, cloud: PointCloud) -> None:
        self.target = prepare_icp_target(cloud, self.cfg)

    def scan_match(self, source: PointCloud, predict_pose):
        result = icp_align(self.target, source, jnp.asarray(predict_pose, jnp.float32), self.cfg)
        self._last_fitness = float(result.fitness)
        return np.asarray(result.pose), self._last_fitness

    def get_fitness_score(self) -> float:
        return self._last_fitness


def make_registration(method: str, **kwargs) -> RegistrationInterface:
    """String-keyed factory matching the reference config values."""
    m = method.upper()
    if m in ("NDT", "NDTMANUAL"):
        return NDTRegistration(kwargs.get("config", NDTConfig()))
    if m in ("ICP", "ICPMANUAL"):
        return ICPRegistration(kwargs.get("config", ICPConfig()))
    if m == "ICPPLANE":
        cfg = kwargs.get("config", ICPConfig(mode="point_to_plane"))
        return ICPRegistration(cfg)
    raise ValueError(f"unknown registration method: {method}")

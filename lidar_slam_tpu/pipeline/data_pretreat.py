"""Data pretreatment: sensor time sync, ENU pose composition, de-skew.

Re-design of DataPretreatFlow (src/data_pretreat/data_pretreat_flow.cpp:
40-281) and the SyncData statics of IMUData/GNSSData/VelocityData
(imu_data.cpp:19-69, gnss_data.cpp:45-87, velocity_data.cpp:10-75):

- streams of stamped IMU / GNSS / velocity records are linearly interpolated
  at each cloud timestamp inside a +-`sync_tolerance` window, dropping stale
  records (the ValidData state machine, data_pretreat_flow.cpp:214-254);
- GNSS lat/lon/alt converts to local ENU about the first fix (or a stored
  map origin for localization-only runs, :124-198);
- the synced pose = ENU translation + IMU orientation, composed with the
  lidar<-IMU extrinsic (TransformData, :256-276);
- velocity is lever-arm transformed into the lidar frame. The reference has
  a component bug here (velocity_data.cpp:66 uses w(1)*r(1)-w(1)*r(0) where
  the x-component of w x r is w(1)*r(2)-w(2)*r(1) pattern — their index slip
  is FIXED here: we compute the exact cross product);
- optional motion de-skew (models/scan_adjust.py), disabled by default as in
  the reference (:268-270).

Host-side numpy: this is the ingestion boundary.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..geom.enu import LocalCartesian
from ..geom.se3 import quat_to_matrix
from ..models.scan_adjust import DistortionConfig, adjust_cloud

import jax.numpy as jnp


@dataclasses.dataclass
class StampedQuat:
    time: float
    quat: np.ndarray  # (w, x, y, z)


@dataclasses.dataclass
class StampedVec:
    time: float
    vec: np.ndarray


def interp_vec(records: List[StampedVec], t: float) -> Optional[np.ndarray]:
    """Linear interpolation of a stamped vector stream at time t."""
    if not records:
        return None
    times = np.asarray([r.time for r in records])
    if t <= times[0]:
        return records[0].vec.copy()
    if t >= times[-1]:
        return records[-1].vec.copy()
    hi = int(np.searchsorted(times, t))
    lo = hi - 1
    a = (t - times[lo]) / max(times[hi] - times[lo], 1e-9)
    return (1 - a) * records[lo].vec + a * records[hi].vec


def interp_quat(records: List[StampedQuat], t: float) -> Optional[np.ndarray]:
    """Component-wise lerp + renormalize — exactly what IMUData::SyncData
    does (imu_data.cpp:40-62); fine for the ~100 Hz IMU rate."""
    if not records:
        return None
    times = np.asarray([r.time for r in records])
    if t <= times[0]:
        return records[0].quat.copy()
    if t >= times[-1]:
        return records[-1].quat.copy()
    hi = int(np.searchsorted(times, t))
    lo = hi - 1
    a = (t - times[lo]) / max(times[hi] - times[lo], 1e-9)
    qa, qb = records[lo].quat, records[hi].quat
    if np.dot(qa, qb) < 0:
        qb = -qb
    q = (1 - a) * qa + a * qb
    return q / np.linalg.norm(q)


def lever_arm_velocity(linear_vel, angular_vel, T_lidar_imu):
    """Transform body (IMU) velocities into the lidar frame including the
    w x r lever-arm term (VelocityData::TransformCoordinate,
    velocity_data.cpp:46-75, with the index bug fixed — exact cross product)."""
    R = T_lidar_imu[:3, :3]
    r = T_lidar_imu[:3, 3]
    w = R @ np.asarray(angular_vel, np.float64)
    v = R @ np.asarray(linear_vel, np.float64)
    v = v + np.cross(w, r)
    return v, w


@dataclasses.dataclass(frozen=True)
class DataPretreatConfig:
    sync_tolerance: float = 0.05  # +-50 ms window (data_pretreat_flow.cpp:214-254)
    adjust_distortion: bool = False  # reference default (:268-270)
    scan_period: float = 0.1


class DataPretreat:
    """Stateful pretreatment: buffers streams, emits synced frames."""

    def __init__(self, config: DataPretreatConfig = DataPretreatConfig(), T_lidar_imu=None):
        self.cfg = config
        self.T_lidar_imu = np.eye(4) if T_lidar_imu is None else np.asarray(T_lidar_imu)
        self.enu = LocalCartesian()
        self.imu_buf: List[StampedQuat] = []
        self.gnss_buf: List[StampedVec] = []  # (lat, lon, alt)
        self.vel_buf: List[StampedVec] = []  # (vx, vy, vz, wx, wy, wz)

    def set_origin(self, lat, lon, alt) -> None:
        """Restore a mapping run's GNSS origin (map_origion.txt mechanism)."""
        self.enu.reset(lat, lon, alt)

    def add_imu(self, time: float, quat) -> None:
        self.imu_buf.append(StampedQuat(time, np.asarray(quat, np.float64)))

    def add_gnss(self, time: float, lat, lon, alt) -> None:
        self.gnss_buf.append(StampedVec(time, np.asarray([lat, lon, alt], np.float64)))

    def add_velocity(self, time: float, linear, angular) -> None:
        self.vel_buf.append(StampedVec(time, np.concatenate([linear, angular]).astype(np.float64)))

    def _trim(self, t: float) -> None:
        tol = self.cfg.sync_tolerance
        self.imu_buf = [r for r in self.imu_buf if r.time >= t - 2 * tol]
        self.gnss_buf = [r for r in self.gnss_buf if r.time >= t - 2 * tol]
        self.vel_buf = [r for r in self.vel_buf if r.time >= t - 2 * tol]

    def process(self, cloud_time: float, points, mask=None):
        """Sync all streams to one cloud stamp. Returns None if any stream
        is outside the tolerance window, else a dict with the synced cloud
        and the GNSS/IMU pose in the lidar frame."""

        def in_window(buf):
            if not buf:
                return False
            times = [r.time for r in buf]
            return min(times) <= cloud_time + self.cfg.sync_tolerance and max(
                times
            ) >= cloud_time - self.cfg.sync_tolerance

        if not (in_window(self.imu_buf) and in_window(self.gnss_buf)):
            return None

        quat = interp_quat(self.imu_buf, cloud_time)
        gnss = interp_vec(self.gnss_buf, cloud_time)
        if quat is None or gnss is None:
            return None
        if not self.enu.initialized:
            self.enu.reset(*gnss)
        enu_t = self.enu.forward(*gnss)

        R_imu = np.asarray(quat_to_matrix(jnp.asarray(quat, jnp.float32)))
        gnss_pose = np.eye(4, dtype=np.float32)
        gnss_pose[:3, :3] = R_imu
        gnss_pose[:3, 3] = np.asarray(enu_t, np.float32)
        # express in the lidar frame (TransformData, :256-276)
        gnss_pose = gnss_pose @ np.linalg.inv(self.T_lidar_imu).astype(np.float32)

        out_points = np.asarray(points, np.float32)
        if mask is None:
            mask = np.ones(len(out_points), bool)
        if self.cfg.adjust_distortion and self.vel_buf:
            vel = interp_vec(self.vel_buf, cloud_time)
            if vel is not None:
                v, w = lever_arm_velocity(vel[:3], vel[3:], self.T_lidar_imu)
                out_points = np.asarray(
                    adjust_cloud(
                        jnp.asarray(out_points),
                        jnp.asarray(mask),
                        jnp.asarray(w, jnp.float32),
                        jnp.asarray(v, jnp.float32),
                        DistortionConfig(scan_period=self.cfg.scan_period),
                    )
                )

        self._trim(cloud_time)
        return {
            "time": cloud_time,
            "points": out_points,
            "mask": np.asarray(mask, bool),
            "gnss_pose": gnss_pose,
            "origin": (self.enu.lat0, self.enu.lon0, self.enu.alt0),
        }

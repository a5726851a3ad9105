"""KITTI raw / odometry dataset readers.

Replaces the reference's entire ROS ingestion chain for offline processing:
rosbag replay of `2011_10_03_drive_0027` (kitti_test/readme.md:17-30) and
A-LOAM's kittiHelper (A-LOAM-devel/src/kittiHelper.cpp:25-180). Pure
numpy/host code — this is the disk boundary, not a device hot path.

Raw-sync layout (what the canonical drive_0027 uses):
  <root>/<date>/<date>_drive_<id>_sync/
    velodyne_points/data/NNNNNNNNNN.bin   float32 x,y,z,reflectance
    velodyne_points/timestamps.txt
    oxts/data/NNNNNNNNNN.txt              lat lon alt roll pitch yaw ... vels
    oxts/timestamps.txt
  <root>/<date>/calib_imu_to_velo.txt     R | T lines

Odometry layout (what kittiHelper consumes):
  <root>/sequences/NN/velodyne/NNNNNN.bin, times.txt
  <root>/poses/NN.txt                     3x4 row-major ground truth
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..geom.enu import geodetic_to_enu
from ..geom.se3 import euler_zyx_to_matrix

import jax.numpy as jnp


def read_velodyne_bin(path: str) -> np.ndarray:
    """Read one KITTI velodyne scan: [N, 4] float32 (x, y, z, reflectance)."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def _read_timestamps(path: str) -> np.ndarray:
    """KITTI raw timestamps.txt ('YYYY-MM-DD HH:MM:SS.nnnnnnnnn') -> seconds
    since the first stamp (float64)."""
    stamps = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            date, time = line.split(" ")
            h, m, s = time.split(":")
            y, mo, d = date.split("-")
            base = _dt.datetime(int(y), int(mo), int(d)).timestamp()
            stamps.append(base + int(h) * 3600 + int(m) * 60 + float(s))
    arr = np.asarray(stamps, np.float64)
    return arr


@dataclass
class OxtsRecord:
    lat: float
    lon: float
    alt: float
    roll: float
    pitch: float
    yaw: float
    vn: float  # north velocity
    ve: float  # east velocity
    vf: float  # forward
    vl: float  # leftward
    vu: float  # upward
    wx: float  # angular rates (frame axes)
    wy: float
    wz: float


def _read_oxts_file(path: str) -> OxtsRecord:
    vals = np.loadtxt(path)
    return OxtsRecord(
        lat=vals[0], lon=vals[1], alt=vals[2],
        roll=vals[3], pitch=vals[4], yaw=vals[5],
        vn=vals[6], ve=vals[7], vf=vals[8], vl=vals[9], vu=vals[10],
        wx=vals[17], wy=vals[18], wz=vals[19],
    )


def read_calib_rt(path: str) -> np.ndarray:
    """Read a KITTI calib file with 'R:' and 'T:' lines -> 4x4 transform."""
    R = np.eye(3)
    T = np.zeros(3)
    with open(path) as f:
        for line in f:
            if line.startswith("R:"):
                R = np.asarray([float(v) for v in line.split()[1:]]).reshape(3, 3)
            elif line.startswith("T:"):
                T = np.asarray([float(v) for v in line.split()[1:]])
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = T
    return M


class KittiRawReader:
    """Frame iterator over a KITTI raw *_sync drive.

    Yields dicts with the velodyne scan, its timestamp, the interpolated-free
    per-frame OXTS record, the GNSS pose in the local ENU frame anchored at
    the first fix (the DataPretreatFlow::InitGNSS semantics,
    data_pretreat_flow.cpp:112-198), and IMU orientation as a matrix.
    """

    def __init__(self, drive_dir: str, calib_dir: Optional[str] = None):
        self.drive_dir = drive_dir
        self.velo_dir = os.path.join(drive_dir, "velodyne_points", "data")
        self.oxts_dir = os.path.join(drive_dir, "oxts", "data")
        self.frames = sorted(f[:-4] for f in os.listdir(self.velo_dir) if f.endswith(".bin"))
        self.velo_stamps = _read_timestamps(
            os.path.join(drive_dir, "velodyne_points", "timestamps.txt")
        )
        self.oxts_stamps = _read_timestamps(os.path.join(drive_dir, "oxts", "timestamps.txt"))
        calib_dir = calib_dir or os.path.dirname(drive_dir.rstrip("/"))
        imu2velo_path = os.path.join(calib_dir, "calib_imu_to_velo.txt")
        self.T_imu_to_velo = read_calib_rt(imu2velo_path) if os.path.exists(imu2velo_path) else np.eye(4)
        self._origin: Optional[tuple] = None

    def __len__(self) -> int:
        return len(self.frames)

    def gnss_origin(self):
        return self._origin

    def set_gnss_origin(self, lat, lon, alt):
        """Allows localization-only mode to reuse a mapping run's origin
        (the map_origion.txt mechanism, data_pretreat_flow.cpp:124-141)."""
        self._origin = (float(lat), float(lon), float(alt))

    def __iter__(self) -> Iterator[dict]:
        for i, frame in enumerate(self.frames):
            scan = read_velodyne_bin(os.path.join(self.velo_dir, frame + ".bin"))
            oxts = _read_oxts_file(os.path.join(self.oxts_dir, frame + ".txt"))
            if self._origin is None:
                self._origin = (oxts.lat, oxts.lon, oxts.alt)
            enu = geodetic_to_enu(oxts.lat, oxts.lon, oxts.alt, *self._origin)
            R = np.asarray(
                euler_zyx_to_matrix(
                    jnp.float32(oxts.roll), jnp.float32(oxts.pitch), jnp.float32(oxts.yaw)
                )
            )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R
            pose[:3, 3] = enu.astype(np.float32)
            yield {
                "index": i,
                "time": float(self.velo_stamps[i] - self.velo_stamps[0]),
                "points": scan[:, :3],
                "reflectance": scan[:, 3],
                "oxts": oxts,
                "gnss_pose": pose,  # IMU/GNSS body pose in ENU
            }


class KittiOdometryReader:
    """Frame iterator over a KITTI odometry sequence (kittiHelper.cpp:37-180)."""

    def __init__(self, root: str, sequence: str):
        seq_dir = os.path.join(root, "sequences", sequence)
        self.velo_dir = os.path.join(seq_dir, "velodyne")
        self.frames = sorted(f[:-4] for f in os.listdir(self.velo_dir) if f.endswith(".bin"))
        self.times = np.loadtxt(os.path.join(seq_dir, "times.txt"))
        poses_path = os.path.join(root, "poses", sequence + ".txt")
        self.gt_poses = None
        if os.path.exists(poses_path):
            raw = np.loadtxt(poses_path).reshape(-1, 3, 4)
            self.gt_poses = np.tile(np.eye(4, dtype=np.float64), (len(raw), 1, 1))
            self.gt_poses[:, :3, :] = raw

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self) -> Iterator[dict]:
        for i, frame in enumerate(self.frames):
            scan = read_velodyne_bin(os.path.join(self.velo_dir, frame + ".bin"))
            yield {
                "index": i,
                "time": float(self.times[i]),
                "points": scan[:, :3],
                "reflectance": scan[:, 3],
                "gt_pose": None if self.gt_poses is None else self.gt_poses[i],
            }

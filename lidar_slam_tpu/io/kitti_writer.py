"""KITTI-raw drive writer — the inverse of io/kitti.py's readers.

Role in the framework: (a) export synthetic worlds as real KITTI-raw trees so
the end-to-end readers -> front end -> back end -> loop closing path is
exercised on actual KITTI-formatted bytes (the reference's whole verification
oracle is KITTI 0027 replay, kitti_test/readme.md:17-30); (b) the reverse of
A-LOAM's kittiHelper (A-LOAM-devel/src/kittiHelper.cpp:25-180), which turns
KITTI trees into topics — we turn trajectories into KITTI trees.

Layout written (read back by io.kitti.KittiRawReader):
  <root>/<date>/<date>_drive_<id>_sync/
    velodyne_points/data/NNNNNNNNNN.bin     float32 x,y,z,reflectance
    velodyne_points/timestamps.txt          'YYYY-MM-DD HH:MM:SS.nnnnnnnnn'
    oxts/data/NNNNNNNNNN.txt                30-field oxts records
    oxts/timestamps.txt
  <root>/<date>/calib_imu_to_velo.txt       'R: ...' / 'T: ...'
  optional <root>/<date>/bbox/<id>/NNNNNNNNNN.txt  per-frame detector boxes
    (x y z dx dy dz heading score per line — the FrontEnd bbox channel,
    front_end.cpp:427-530's hard-coded txt path made explicit)
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np

from ..geom.enu import enu_to_geodetic
from ..geom.se3 import matrix_to_euler_zyx, so3_log

# OXTS record has 30 fields (KITTI raw devkit): we populate lat/lon/alt,
# roll/pitch/yaw, vn/ve (6:8), body vf/vl/vu (8:11) and body angular rates
# wx/wy/wz (17:20, from frame-to-frame pose deltas); the rest stay zero.
_OXTS_FIELDS = 30


def _fmt_timestamp(t: float, date: str) -> str:
    """Seconds-of-day float -> KITTI 'YYYY-MM-DD HH:MM:SS.nnnnnnnnn'."""
    h = int(t // 3600)
    m = int((t % 3600) // 60)
    s = t - h * 3600 - m * 60
    return f"{date} {h:02d}:{m:02d}:{s:012.9f}"


def write_kitti_raw_drive(
    root: str,
    frames: Iterable[dict],
    date: str = "2026_08_20",
    drive_id: str = "0001",
    origin=(48.98254523586602, 8.39036610004, 116.43),
    T_imu_to_velo: Optional[np.ndarray] = None,
    dt: float = 0.1,
) -> str:
    """Write frames as a KITTI raw *_sync drive; returns the drive directory.

    Each frame dict needs:
      points [N, 3] float32     velodyne-frame scan
      pose   [4, 4]             IMU/GNSS body pose in the local ENU frame
      reflectance [N] optional  defaults to zeros
      bboxes [B, 8] optional    sensor-frame detector boxes (written when any
                                frame carries them)
      time   float optional     defaults to i * dt seconds
    `origin` is the geodetic anchor the ENU poses are expressed about (the
    first oxts record will decode back to pose[0] exactly through
    KittiRawReader's first-fix anchoring).
    """
    date_dir = os.path.join(root, date)
    drive_dir = os.path.join(date_dir, f"{date}_drive_{drive_id}_sync")
    velo_dir = os.path.join(drive_dir, "velodyne_points", "data")
    oxts_dir = os.path.join(drive_dir, "oxts", "data")
    os.makedirs(velo_dir, exist_ok=True)
    os.makedirs(oxts_dir, exist_ok=True)

    if T_imu_to_velo is None:
        T_imu_to_velo = np.eye(4)
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write("calib_time: synthetic\n")
        f.write("R: " + " ".join(f"{v:.12e}" for v in T_imu_to_velo[:3, :3].ravel()) + "\n")
        f.write("T: " + " ".join(f"{v:.12e}" for v in T_imu_to_velo[:3, 3]) + "\n")

    stamps = []
    bbox_frames = {}
    lat0, lon0, alt0 = origin
    prev_pos = None
    prev_rot = None
    base_t = 8 * 3600.0  # 08:00:00, arbitrary
    for i, frame in enumerate(frames):
        pts = np.asarray(frame["points"], np.float32)
        refl = np.asarray(
            frame.get("reflectance", np.zeros(len(pts), np.float32)), np.float32
        )
        scan = np.concatenate([pts, refl[:, None]], axis=1).astype(np.float32)
        scan.tofile(os.path.join(velo_dir, f"{i:010d}.bin"))

        pose = np.asarray(frame["pose"], np.float64)
        t = float(frame.get("time", i * dt))
        stamps.append(base_t + t)

        lat, lon, alt = enu_to_geodetic(pose[:3, 3], lat0, lon0, alt0)
        roll, pitch, yaw = (float(v) for v in matrix_to_euler_zyx(pose[:3, :3].astype(np.float32)))
        vel_enu = (
            (pose[:3, 3] - prev_pos) / dt if prev_pos is not None else np.zeros(3)
        )
        if prev_rot is not None:
            # body angular rate from the relative rotation over one frame
            w_body = np.asarray(
                so3_log(np.asarray(prev_rot.T @ pose[:3, :3], np.float32))
            ) / dt
        else:
            w_body = np.zeros(3)
        prev_pos = pose[:3, 3].copy()
        prev_rot = pose[:3, :3].copy()
        rec = np.zeros(_OXTS_FIELDS)
        rec[0:3] = [lat, lon, alt]
        rec[3:6] = [roll, pitch, yaw]
        rec[6] = vel_enu[1]  # vn
        rec[7] = vel_enu[0]  # ve
        # body-frame forward/left/up velocity
        v_body = pose[:3, :3].T @ vel_enu
        rec[8:11] = v_body
        rec[17:20] = w_body  # wx/wy/wz — consumed by KittiRawReader as rates
        np.savetxt(
            os.path.join(oxts_dir, f"{i:010d}.txt"), rec[None, :], fmt="%.12g"
        )

        if frame.get("bboxes") is not None and len(frame["bboxes"]):
            bbox_frames[i] = np.asarray(frame["bboxes"], np.float64)

    ts = "\n".join(_fmt_timestamp(t, date.replace("_", "-")) for t in stamps) + "\n"
    with open(os.path.join(drive_dir, "velodyne_points", "timestamps.txt"), "w") as f:
        f.write(ts)
    with open(os.path.join(drive_dir, "oxts", "timestamps.txt"), "w") as f:
        f.write(ts)

    if bbox_frames:
        bbox_dir = os.path.join(date_dir, "bbox", drive_id)
        os.makedirs(bbox_dir, exist_ok=True)
        n = len(stamps)
        for i in range(n):
            boxes = bbox_frames.get(i, np.zeros((0, 8)))
            np.savetxt(os.path.join(bbox_dir, f"{i:010d}.txt"), boxes, fmt="%.8g")

    return drive_dir


def read_bbox_dir(bbox_dir: str, index: int) -> Optional[np.ndarray]:
    """Read one frame's detector boxes [B, 8] from a per-frame txt directory
    (the explicit-path version of ImportBBOXFromFile, front_end.cpp:427-530).
    Returns None when the file is absent."""
    path = os.path.join(bbox_dir, f"{index:010d}.txt")
    if not os.path.exists(path):
        return None
    boxes = np.loadtxt(path)
    if boxes.size == 0:
        return None
    return boxes.reshape(-1, 8)

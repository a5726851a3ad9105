"""Geodetic (WGS-84) -> local East-North-Up conversion.

Replaces the reference's GeographicLib `LocalCartesian` usage
(lidar_localization/src/sensor_data/gnss_data.cpp:19-36). Implemented in
host-side numpy float64 on purpose: this runs once per GNSS fix at data
ingestion (not a device hot path), and the ~6.4e6 m ECEF magnitudes destroy
float32 precision (JAX's default dtype). Outputs are metre-scale ENU floats
that are then safe to cast to float32 for the device pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# WGS-84 ellipsoid
_A = 6378137.0  # semi-major axis [m]
_F = 1.0 / 298.257223563  # flattening
_E2 = _F * (2.0 - _F)  # first eccentricity squared


def _geodetic_to_ecef(lat_deg, lon_deg, alt):
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, np.float64))
    alt = np.asarray(alt, np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * sin_lat
    return np.stack([x, y, z], axis=-1)


def geodetic_to_enu(lat, lon, alt, lat0, lon0, alt0):
    """Convert geodetic coordinates to ENU metres about origin (lat0, lon0, alt0).

    Scalar or batched over leading dims of lat/lon/alt. Returns float64 [..., 3].
    """
    ecef = _geodetic_to_ecef(lat, lon, alt)
    ecef0 = _geodetic_to_ecef(lat0, lon0, alt0)
    d = ecef - ecef0
    lat0r = np.deg2rad(np.float64(lat0))
    lon0r = np.deg2rad(np.float64(lon0))
    sl, cl = np.sin(lat0r), np.cos(lat0r)
    so, co = np.sin(lon0r), np.cos(lon0r)
    rot = np.array(
        [
            [-so, co, 0.0],
            [-sl * co, -sl * so, cl],
            [cl * co, cl * so, sl],
        ],
        dtype=np.float64,
    )
    return np.einsum("ij,...j->...i", rot, d)


def _ecef_to_geodetic(ecef):
    """ECEF [..., 3] -> (lat_deg, lon_deg, alt). Bowring's method with two
    refinement iterations — sub-micrometre at automotive altitudes."""
    ecef = np.asarray(ecef, np.float64)
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    # initial parametric latitude
    b = _A * (1.0 - _F)
    e2p = (_A * _A - b * b) / (b * b)
    theta = np.arctan2(z * _A, p * b)
    lat = np.arctan2(
        z + e2p * b * np.sin(theta) ** 3, p - _E2 * _A * np.cos(theta) ** 3
    )
    for _ in range(2):
        sin_lat = np.sin(lat)
        n = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
        alt = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - _E2 * n / (n + alt)))
    sin_lat = np.sin(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    alt = p / np.cos(lat) - n
    return np.rad2deg(lat), np.rad2deg(lon), alt


def enu_to_geodetic(enu, lat0, lon0, alt0):
    """Inverse of geodetic_to_enu: local ENU metres about (lat0, lon0, alt0)
    -> (lat_deg, lon_deg, alt). Used by the KITTI-raw fixture writer
    (io/kitti_writer.py) to emit oxts records from metric trajectories."""
    enu = np.asarray(enu, np.float64)
    lat0r = np.deg2rad(np.float64(lat0))
    lon0r = np.deg2rad(np.float64(lon0))
    sl, cl = np.sin(lat0r), np.cos(lat0r)
    so, co = np.sin(lon0r), np.cos(lon0r)
    rot = np.array(
        [
            [-so, co, 0.0],
            [-sl * co, -sl * so, cl],
            [cl * co, cl * so, sl],
        ],
        dtype=np.float64,
    )
    d = np.einsum("ji,...j->...i", rot, enu)  # rot^T @ enu
    ecef = _geodetic_to_ecef(lat0, lon0, alt0) + d
    return _ecef_to_geodetic(ecef)


@dataclass
class LocalCartesian:
    """Stateful convenience wrapper mirroring GeographicLib's LocalCartesian API
    (`Reset` + `Forward`) as used by GNSSData (gnss_data.cpp:27-44)."""

    lat0: float = 0.0
    lon0: float = 0.0
    alt0: float = 0.0
    initialized: bool = False

    def reset(self, lat, lon, alt):
        self.lat0, self.lon0, self.alt0 = float(lat), float(lon), float(alt)
        self.initialized = True

    def forward(self, lat, lon, alt):
        if not self.initialized:
            raise RuntimeError("LocalCartesian origin not initialized; call reset() first")
        return geodetic_to_enu(lat, lon, alt, self.lat0, self.lon0, self.alt0)

"""ctypes bindings for the native host runtime (runtime/lidar_runtime.cpp).

The C++ layer is the host-side equivalent of the reference's ROS/PCL
ingestion runtime: mmap-free .bin reading, fused mask+voxel downsampling and
a threaded prefetcher that keeps padded frames ready while the TPU computes.
Falls back gracefully (native_available() == False) when the library has not
been built (`sh runtime/build.sh`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "runtime", "build", "liblidar_runtime.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path):
        raise FileNotFoundError(f"native runtime not built: {path} (run sh runtime/build.sh)")
    lib = ctypes.CDLL(path)
    lib.lr_voxel_downsample.restype = ctypes.c_int64
    lib.lr_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.lr_read_velodyne_bin.restype = ctypes.c_int64
    lib.lr_read_velodyne_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.lr_prefetcher_create.restype = ctypes.c_void_p
    lib.lr_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.lr_prefetcher_next.restype = ctypes.c_int64
    lib.lr_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
    lib.lr_prefetcher_destroy.restype = None
    lib.lr_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def voxel_downsample_native(
    points: np.ndarray,
    leaf: float,
    capacity: int,
    min_range: float = 0.0,
    max_range: float = 1e9,
    weights: bool = False,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Fused finite/range mask + voxel centroid downsample on the host.

    points: [N, >=3] float32 (col 3 is the weight channel if weights=True).
    Returns (out_points [capacity, 3] f32, mask [capacity] bool, n_valid).
    """
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    stride = pts.shape[1]
    out = np.zeros((capacity, 3), np.float32)
    msk = np.zeros(capacity, np.uint8)
    n = lib.lr_voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        stride,
        3 if weights and stride > 3 else -1,
        leaf,
        min_range,
        max_range,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        None,
        msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        capacity,
    )
    return out, msk.astype(bool), int(n)


def read_velodyne_bin_native(path: str, max_points: int = 200000) -> np.ndarray:
    lib = _load()
    buf = np.empty((max_points, 4), np.float32)
    n = lib.lr_read_velodyne_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points
    )
    if n < 0:
        raise IOError(f"cannot read {path}")
    return buf[:n].copy()


class NativePrefetcher:
    """Threaded in-order scan prefetcher: next() yields (points, mask)."""

    def __init__(
        self,
        paths: List[str],
        leaf: float,
        capacity: int,
        min_range: float = 0.0,
        max_range: float = 120.0,
        n_threads: int = 4,
        lookahead: int = 8,
    ):
        lib = _load()
        self._lib = lib
        self.capacity = capacity
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._h = lib.lr_prefetcher_create(
            arr, len(paths), leaf, min_range, max_range, capacity, n_threads, lookahead
        )
        self.n = len(paths)
        self._emitted = 0

    def next(self) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
        if self._emitted >= self.n:
            return None
        pts = np.empty((self.capacity, 3), np.float32)
        msk = np.empty(self.capacity, np.uint8)
        nv = self._lib.lr_prefetcher_next(
            self._h,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if nv < 0:
            return None
        self._emitted += 1
        return pts, msk.astype(bool), int(nv)

    def close(self):
        if self._h:
            self._lib.lr_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

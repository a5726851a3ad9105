from .kitti import KittiRawReader, KittiOdometryReader, read_velodyne_bin
from .trajectory import (
    write_kitti_trajectory,
    read_kitti_trajectory,
    ate_rmse,
    rpe,
    umeyama_alignment,
)
from .synthetic import (
    SyntheticWorld,
    simulate_scan,
    simulate_spinning_scan,
    make_trajectory,
    make_hairpin_trajectory,
    hdl64_elevations,
)

__all__ = [
    "KittiRawReader",
    "KittiOdometryReader",
    "read_velodyne_bin",
    "write_kitti_trajectory",
    "read_kitti_trajectory",
    "ate_rmse",
    "rpe",
    "umeyama_alignment",
    "SyntheticWorld",
    "simulate_scan",
    "simulate_spinning_scan",
    "make_trajectory",
    "make_hairpin_trajectory",
    "hdl64_elevations",
]

from .eigh3 import sym_eigh3
from .pointcloud import (
    PointCloud,
    finite_mask,
    range_mask,
    voxel_downsample,
    box_crop_mask,
    rotated_box_mask,
)
from .hashgrid import BucketGrid, build_bucket_grid, knn_query

__all__ = [
    "sym_eigh3",
    "PointCloud",
    "finite_mask",
    "range_mask",
    "voxel_downsample",
    "box_crop_mask",
    "rotated_box_mask",
    "BucketGrid",
    "build_bucket_grid",
    "knn_query",
]

"""Cloud filter strategy objects.

Mirrors the reference's CloudFilterInterface family
(include/.../models/cloud_filter/*, src/models/cloud_filter/*):
VoxelFilter (pcl::VoxelGrid), BoxFilter (pcl::CropBox), NoFilter. The
reference selects them by YAML string key (front_end.cpp:58-86); use
`make_cloud_filter` for the same behavior.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops.pointcloud import PointCloud, box_crop_mask, voxel_downsample


class CloudFilterInterface:
    def filter(self, cloud: PointCloud) -> PointCloud:
        raise NotImplementedError


class VoxelFilter(CloudFilterInterface):
    """Per-axis leaf sizes as in voxel_filter.cpp:12-41."""

    def __init__(self, leaf_size, out_capacity: Optional[int] = None):
        self.leaf_size = leaf_size
        self.out_capacity = out_capacity

    def filter(self, cloud: PointCloud) -> PointCloud:
        return voxel_downsample(cloud, self.leaf_size, out_capacity=self.out_capacity)


class BoxFilter(CloudFilterInterface):
    """Origin + size -> axis-aligned crop (box_filter.cpp:14-73). Masks
    instead of compacting."""

    def __init__(self, origin: Sequence[float], size: Sequence[float]):
        self.origin = jnp.asarray(origin, jnp.float32)
        self.size = jnp.asarray(size, jnp.float32)

    def filter(self, cloud: PointCloud) -> PointCloud:
        lo = self.origin - self.size / 2
        hi = self.origin + self.size / 2
        keep = cloud.mask & box_crop_mask(cloud.points, lo, hi)
        return cloud.replace(mask=keep)


class NoFilter(CloudFilterInterface):
    """Identity (no_filter.cpp:10-15)."""

    def filter(self, cloud: PointCloud) -> PointCloud:
        return cloud


def make_cloud_filter(method: str, **kwargs) -> CloudFilterInterface:
    method = method.lower()
    if method in ("voxel", "voxel_filter"):
        return VoxelFilter(**kwargs)
    if method in ("box", "box_filter"):
        return BoxFilter(**kwargs)
    if method in ("no", "no_filter", "none"):
        return NoFilter()
    raise ValueError(f"unknown cloud filter method: {method}")

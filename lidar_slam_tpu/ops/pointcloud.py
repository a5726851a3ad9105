"""Masked point-cloud primitives over padded static-shape arrays.

TPU-native replacements for the reference's PCL usage:
- `finite_mask`     ~ pcl::removeNaNFromPointCloud (front_end.cpp:92)
- `range_mask`      ~ A-LOAM removeClosedPointCloud (scanRegistration.cpp:86-112)
- `voxel_downsample`~ pcl::VoxelGrid / VoxelFilter (models/cloud_filter/voxel_filter.cpp:12-41)
- `box_crop_mask`   ~ pcl::CropBox / BoxFilter (models/cloud_filter/box_filter.cpp:14-73)
- `rotated_box_mask`~ the per-bbox rotated CropBox loop used for detector boxes
                      (front_end.cpp:128-161), vectorized over boxes x points.

Clouds are `[N, 3]` float32 with a `[N]` bool validity mask; removal ops keep
static shapes and flip mask bits instead of compacting. `voxel_downsample` is
exact (lexicographic sort-based voxel grouping, no hash collisions).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class PointCloud:
    """Padded point cloud. `points[i]` is meaningful iff `mask[i]`.

    `weights` carries the per-point static weight as a first-class channel —
    the reference smuggles it through `intensity` (cloud_data.hpp:35-48,
    front_end.cpp:306-326); we do not.
    """

    points: jax.Array  # [N, 3] float32
    mask: jax.Array  # [N] bool
    weights: Optional[jax.Array] = None  # [N] float32, default 1.0

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def num_valid(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def get_weights(self):
        if self.weights is None:
            return jnp.ones(self.points.shape[:-1], dtype=self.points.dtype)
        return self.weights

    def permute(self, order) -> "PointCloud":
        """Reorder all channels (incl. weights) by an index array."""
        return PointCloud(
            points=self.points[order],
            mask=self.mask[order],
            weights=None if self.weights is None else self.weights[order],
        )

    @staticmethod
    def from_points(points, weights=None, capacity: Optional[int] = None):
        points = jnp.asarray(points, jnp.float32)
        n = points.shape[0]
        cap = capacity if capacity is not None else n
        pad = cap - n
        if pad < 0:
            raise ValueError(f"capacity {cap} < n points {n}")
        pts = jnp.pad(points, ((0, pad), (0, 0)))
        mask = jnp.pad(jnp.ones((n,), bool), (0, pad))
        w = None
        if weights is not None:
            w = jnp.pad(jnp.asarray(weights, jnp.float32), (0, pad))
        return PointCloud(points=pts, mask=mask, weights=w)


def finite_mask(points):
    """True where all three coordinates are finite."""
    return jnp.all(jnp.isfinite(points), axis=-1)


def range_mask(points, min_range: float = 0.0, max_range: float = jnp.inf):
    """True where min_range <= |p| <= max_range."""
    r2 = jnp.sum(points * points, axis=-1)
    return (r2 >= min_range * min_range) & (r2 <= max_range * max_range)


def _voxel_coords(points, leaf):
    leaf = jnp.asarray(leaf, points.dtype)
    return jnp.floor(points / leaf).astype(jnp.int32)


def voxel_downsample(cloud: PointCloud, leaf_size, out_capacity: Optional[int] = None) -> PointCloud:
    """Exact voxel-grid centroid downsampling with static shapes.

    Groups valid points by integer voxel coordinate via a 3-key lexicographic
    sort (jit-safe; no spatial hashing, so no collisions), then reduces each
    group to its centroid with `segment_sum`. Per-point weights average per
    voxel — the same semantics the reference's NDT VoxelGrid applies to
    intensity (VoxelGrid.cpp:268,287).

    Args:
      cloud: input PointCloud [N].
      leaf_size: scalar or [3] leaf size in metres.
      out_capacity: capacity of the output cloud (default: same N).
    Returns:
      PointCloud of voxel centroids (mask marks real voxels).
    """
    n = cloud.capacity
    out_cap = out_capacity if out_capacity is not None else n
    pts = cloud.points
    mask = cloud.mask
    w = cloud.get_weights()

    coords = _voxel_coords(pts, jnp.broadcast_to(jnp.asarray(leaf_size, jnp.float32), (3,)))

    # One packed-int key instead of a 3-key lexsort (one sort instead of
    # three): shift cells to the cloud's min corner; x/y get 11 bits (2048
    # cells), z gets 9 (512 — LiDAR height extent is always the small axis).
    # 2048 cells cover 1 km at the 0.5 m production leaf and 205 m even at
    # A-LOAM's finest 0.1 m map leaf; a cloud exceeding the packed range
    # clamps, which can only MERGE two far-apart boundary voxels (a bounded
    # density artifact at >1 km extents, never a crash or dropped points).
    # Key layout is x-major (x high bits): downstream consumers rely on
    # spatial coherence along x — the fused NDT kernel's per-tile key window
    # matches the x-major flat voxel id layout.
    big_c = jnp.int32(2**20)
    cmin = jnp.min(jnp.where(mask[:, None], coords, big_c), axis=0)
    rel = coords - cmin
    # z clips to 510 (not 511) so the max packable key is int32max - 1 and
    # the invalid sentinel int32max is strictly greater than every valid key
    # (invalid points must sort last, not merge into a boundary voxel).
    rel = jnp.clip(rel, 0, jnp.asarray([2047, 2047, 510], jnp.int32))
    key = (rel[:, 0] << 20) | (rel[:, 1] << 9) | rel[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)  # invalid sorts last

    # multi-operand sort carries the payload channels THROUGH the sort:
    # argsort + three reorder gathers measured 2.7 ms at 131k points on a
    # v5e (TPU gathers run near one row per cycle) vs 0.57 ms for the
    # payload-carrying sort itself
    sk, sx, sy, sz, smi, sw = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2], mask.astype(jnp.int32), w),
        num_keys=1,
    )
    sp = jnp.stack([sx, sy, sz], axis=-1)
    sm = smi.astype(bool)

    new_group = sk != jnp.roll(sk, 1)
    new_group = new_group.at[0].set(True)
    seg = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # [N] segment ids, sorted

    wm = sm.astype(jnp.float32)
    counts = jax.ops.segment_sum(wm, seg, num_segments=out_cap)
    sums = jax.ops.segment_sum(sp * wm[:, None], seg, num_segments=out_cap)
    wsums = jax.ops.segment_sum(sw * wm, seg, num_segments=out_cap)

    denom = jnp.maximum(counts, 1.0)
    centroids = sums / denom[:, None]
    wmeans = wsums / denom
    out_mask = counts > 0
    return PointCloud(points=jnp.where(out_mask[:, None], centroids, 0.0), mask=out_mask, weights=wmeans)


def voxel_downsample_dense(
    cloud: PointCloud,
    leaf_size,
    out_capacity: int,
    dims: Tuple[int, int, int] = (352, 352, 96),
) -> PointCloud:
    """Sort-free voxel-grid centroid downsampling over a bounded dense grid.

    MEASURED NEGATIVE RESULT (kept for the record + small-grid use): at
    scan scale (131k points, 352x352x96 grid) this runs 21 ms on a v5e vs
    the sort-based variant's 6.3 ms — the dense scatter-add + 11.9M-cell
    compaction loses badly to one [N] key sort. Scatter-adds into a large
    dense grid serialize; sorts at least stream. A Pallas counting-sort /
    binning kernel remains the credible path below the sort's 6.3 ms.
    Semantics: scatter-adds per-voxel moment sums into a dense `dims` grid
    anchored at the cloud's min corner and compacts occupied cells with
    cumsum + searchsorted — output voxels in flat-id (x-major) order, the
    same spatially-coherent order the sorted variant produces.

    Points outside origin + dims*leaf are DROPPED (the default covers a
    176 m x 176 m x 48 m window — beyond any automotive lidar's single
    sweep at the production 0.5 m leaf). Centroids match `voxel_downsample`
    to f32 reduction-order tolerance; use the general version for unbounded
    inputs (accumulated maps, multi-keyframe concatenations).
    """
    out_cap = out_capacity
    pts = cloud.points
    mask = cloud.mask
    w = cloud.get_weights()
    leaf = jnp.broadcast_to(jnp.asarray(leaf_size, jnp.float32), (3,))
    v = dims[0] * dims[1] * dims[2]

    coords = _voxel_coords(pts, leaf)
    big_c = jnp.int32(2**20)
    cmin = jnp.min(jnp.where(mask[:, None], coords, big_c), axis=0)
    rel = coords - cmin
    inb = jnp.all((rel >= 0) & (rel < jnp.asarray(dims, jnp.int32)), axis=-1)
    ok = mask & inb
    vid = (rel[:, 0] * dims[1] + rel[:, 1]) * dims[2] + rel[:, 2]
    vid = jnp.where(ok, vid, v)  # dropped/invalid -> out-of-range segment

    okf = ok.astype(jnp.float32)
    counts = jax.ops.segment_sum(okf, vid, num_segments=v)
    sums = jax.ops.segment_sum(pts * okf[:, None], vid, num_segments=v)
    wsums = jax.ops.segment_sum(w * okf, vid, num_segments=v)

    occupied = counts > 0.0
    csum = jnp.cumsum(occupied.astype(jnp.int32))
    total = jnp.minimum(csum[-1], out_cap)
    j = jnp.arange(out_cap, dtype=jnp.int32)
    keys = jnp.searchsorted(csum, j + 1, side="left").astype(jnp.int32)
    has = j < total
    kv = jnp.where(has, keys, 0)

    cnt = jnp.where(has, counts[kv], 0.0)
    denom = jnp.maximum(cnt, 1.0)
    centroids = jnp.where(has[:, None], sums[kv] / denom[:, None], 0.0)
    wmeans = jnp.where(has, wsums[kv] / denom, 1.0)
    return PointCloud(points=centroids, mask=has & (cnt > 0), weights=wmeans)


def box_crop_mask(points, min_corner, max_corner):
    """True where points lie inside the axis-aligned box [min_corner, max_corner].

    BoxFilter equivalence: the reference configures origin+size and derives
    edges (box_filter.cpp:39-55); pass min=origin-size/2 etc. at the call site.
    """
    min_corner = jnp.asarray(min_corner, points.dtype)
    max_corner = jnp.asarray(max_corner, points.dtype)
    return jnp.all((points >= min_corner) & (points <= max_corner), axis=-1)


def rotated_box_mask(points, boxes):
    """Membership of points in yaw-rotated 3-D boxes.

    Args:
      points: [N, 3].
      boxes: [B, 7] rows (cx, cy, cz, dx, dy, dz, heading) — the CloudBbox
        layout (include/.../sensor_data/cloud_bbox.hpp:12-26).
    Returns:
      [B, N] bool mask; row b marks the points inside box b.
    """
    centers = boxes[:, :3]  # [B, 3]
    half = boxes[:, 3:6] * 0.5  # [B, 3]
    heading = boxes[:, 6]  # [B]
    d = points[None, :, :] - centers[:, None, :]  # [B, N, 3]
    c, s = jnp.cos(heading), jnp.sin(heading)
    # Rotate deltas into the box frame (inverse yaw).
    lx = c[:, None] * d[..., 0] + s[:, None] * d[..., 1]
    ly = -s[:, None] * d[..., 0] + c[:, None] * d[..., 1]
    lz = d[..., 2]
    local = jnp.stack([lx, ly, lz], axis=-1)
    return jnp.all(jnp.abs(local) <= half[:, None, :], axis=-1)

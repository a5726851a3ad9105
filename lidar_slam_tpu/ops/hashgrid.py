"""Static-shape uniform bucket grid for nearest-neighbour search.

TPU-native replacement for every dynamic spatial index in the reference:
pcl::KdTreeFLANN (icp_registration_manual.cpp:31, laserOdometry.cpp),
the NDT octree (ndt_registration_manual/Octree.cpp:638-913) and nanoflann
(scan_context retrieval uses its own path in models/scan_context.py).

Design: points are binned into a dense regular grid (CSR layout built with a
single sort + segment reduction — no pointers, no recursion, all static
shapes). A query gathers the candidates of a fixed 3x3x3 cell stencil and
reduces with `lax.top_k`. With cell_size >= the correspondence gate radius,
the stencil provably covers every in-gate neighbour, so results match exact
KNN for gated correspondence search (the only way the reference uses its
trees). Queries are internally chunked with `lax.map` to bound the
materialized candidate tensor.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from .pointcloud import PointCloud


@flax.struct.dataclass
class BucketGrid:
    points: jax.Array  # [N, 3] points sorted by cell id
    point_idx: jax.Array  # [N] original index of each sorted point
    valid: jax.Array  # [N] bool (sorted)
    cell_starts: jax.Array  # [V] int32 start offset of each cell in sorted order
    cell_counts: jax.Array  # [V] int32 number of valid points in each cell
    origin: jax.Array  # [3] float32 grid origin (min corner)
    cell_size: jax.Array  # [] float32
    dims: Tuple[int, int, int] = flax.struct.field(pytree_node=False)


def _flat_cell_id(coords, dims):
    return (coords[..., 0] * dims[1] + coords[..., 1]) * dims[2] + coords[..., 2]


def build_bucket_grid(
    cloud: PointCloud,
    cell_size: float,
    dims: Tuple[int, int, int],
    origin=None,
) -> BucketGrid:
    """Build the CSR bucket grid over a cloud.

    Args:
      cloud: target points [N].
      cell_size: cell edge length; choose >= the query gate radius.
      dims: static grid dimensions (cells per axis). Points outside
        origin + dims*cell_size are dropped (marked invalid).
      origin: [3] grid min corner. Default: centre the grid on the masked
        centroid of the cloud.
    """
    pts = cloud.points
    mask = cloud.mask
    n = pts.shape[0]
    v = dims[0] * dims[1] * dims[2]
    cs = jnp.asarray(cell_size, jnp.float32)

    if origin is None:
        denom = jnp.maximum(jnp.sum(mask), 1)
        centroid = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / denom
        origin = centroid - 0.5 * cs * jnp.asarray(dims, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)

    coords = jnp.floor((pts - origin) / cs).astype(jnp.int32)
    in_bounds = jnp.all((coords >= 0) & (coords < jnp.asarray(dims, jnp.int32)), axis=-1)
    ok = mask & in_bounds
    cid = jnp.where(ok, _flat_cell_id(coords, dims), v)  # invalid -> sentinel cell v (sorts last)

    # multi-operand sort (payloads carried through the sort) beats
    # argsort + reorder gathers ~5x on TPU; the original index is carried as
    # a payload so point_idx survives for query results
    iota = jnp.arange(pts.shape[0], dtype=jnp.int32)
    sorted_cid, sx, sy, sz, oki, order = jax.lax.sort(
        (cid, pts[:, 0], pts[:, 1], pts[:, 2], ok.astype(jnp.int32), iota),
        num_keys=1,
    )
    sorted_pts = jnp.stack([sx, sy, sz], axis=-1)
    sorted_ok = oki.astype(bool)

    counts = jax.ops.segment_sum(
        sorted_ok.astype(jnp.int32), jnp.where(sorted_ok, sorted_cid, 0), num_segments=v
    )
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]).astype(jnp.int32)

    return BucketGrid(
        points=sorted_pts,
        point_idx=order.astype(jnp.int32),
        valid=sorted_ok,
        cell_starts=starts,
        cell_counts=counts,
        origin=origin,
        cell_size=cs,
        dims=dims,
    )


# Static 3x3x3 stencil offsets.
def _stencil_offsets(radius_cells: int = 1):
    r = radius_cells
    axis = jnp.arange(-r, r + 1, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)  # [S, 3]


def knn_query(
    grid: BucketGrid,
    queries,
    k: int,
    max_radius: float,
    bucket_k: int = 16,
    chunk: int = 4096,
):
    """k nearest neighbours of each query within max_radius.

    Args:
      grid: BucketGrid built with cell_size >= max_radius.
      queries: [Q, 3].
      k: neighbours per query (static).
      max_radius: gate radius; matches the reference's correspondence gates
        (e.g. ICP max_correspond_dis, icp_registration_manual.cpp:139-141).
      bucket_k: max candidates read per stencil cell (static). Cells holding
        more points than this are truncated (downsample the target first if
        that matters).
      chunk: query chunk size for bounding the candidate tensor.
    Returns:
      (idx [Q, k] int32 original-cloud indices, dist [Q, k] float32 Euclidean
      distances, valid [Q, k] bool). Invalid slots have dist = +inf.
    """
    q = queries.shape[0]
    dims = grid.dims
    v = dims[0] * dims[1] * dims[2]
    offsets = _stencil_offsets(1)  # [27, 3]
    s = offsets.shape[0]
    max_r2 = jnp.asarray(max_radius, jnp.float32) ** 2

    pad_q = (-q) % chunk
    qpad = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qchunks = qpad.reshape(-1, chunk, 3)

    def one_chunk(qc):
        qcoords = jnp.floor((qc - grid.origin) / grid.cell_size).astype(jnp.int32)  # [C, 3]
        cand_coords = qcoords[:, None, :] + offsets[None, :, :]  # [C, S, 3]
        in_b = jnp.all((cand_coords >= 0) & (cand_coords < jnp.asarray(dims, jnp.int32)), axis=-1)
        flat = jnp.clip(_flat_cell_id(cand_coords, dims), 0, v - 1)  # [C, S]
        starts = grid.cell_starts[flat]  # [C, S]
        counts = jnp.where(in_b, grid.cell_counts[flat], 0)  # [C, S]

        j = jnp.arange(bucket_k, dtype=jnp.int32)  # [K]
        slot_ok = j[None, None, :] < counts[:, :, None]  # [C, S, K]
        sidx = jnp.clip(starts[:, :, None] + j[None, None, :], 0, grid.points.shape[0] - 1)
        cand_pts = grid.points[sidx]  # [C, S, K, 3]
        cand_idx = grid.point_idx[sidx]  # [C, S, K]

        d2 = jnp.sum((cand_pts - qc[:, None, None, :]) ** 2, axis=-1)  # [C, S, K]
        ok = slot_ok & (d2 <= max_r2)
        d2 = jnp.where(ok, d2, jnp.inf)

        d2f = d2.reshape(qc.shape[0], s * bucket_k)
        idxf = cand_idx.reshape(qc.shape[0], s * bucket_k)
        neg = -d2f
        top_neg, top_pos = jax.lax.top_k(neg, k)  # largest of -d2 = smallest d2
        top_d2 = -top_neg
        top_idx = jnp.take_along_axis(idxf, top_pos, axis=-1)
        top_ok = jnp.isfinite(top_d2)
        return top_idx, jnp.sqrt(jnp.where(top_ok, top_d2, jnp.inf)), top_ok

    idx_c, dist_c, ok_c = jax.lax.map(one_chunk, qchunks)
    idx = idx_c.reshape(-1, k)[:q]
    dist = dist_c.reshape(-1, k)[:q]
    ok = ok_c.reshape(-1, k)[:q]
    return idx, dist, ok

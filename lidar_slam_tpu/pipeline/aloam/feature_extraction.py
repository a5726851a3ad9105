"""A-LOAM scan registration: edge/planar feature extraction.

Re-design of laserCloudHandler (A-LOAM-devel/src/scanRegistration.cpp:114-503)
as fixed-shape JAX:

- min-range filter (removeClosedPointCloud, :86-112);
- ring assignment from elevation (16/32/64-beam formulas, :169-205);
- per-point relative scan time from azimuth (:206-246);
- curvature = |sum of 10 neighbours - 10 p|^2 in ring-major order (:256-266);
- per ring x 6 equal-count sectors: 2 sharp + 20 less-sharp corners
  (curv > 0.1), 4 flat surf points (curv < 0.1), the rest less-flat
  downsampled (:277-408);
- greedy neighbour suppression: +-5 ring neighbours of every pick are
  blocked unless a >0.05 m^2 gap interrupts (:319-342).

The sequential per-sector curvature sort becomes: ONE sort of all points by
(sector, curvature), compaction of the top/bottom candidates of every sector
into a small dense [n_sectors, M] table, then the greedy pick+suppress rounds
run on that table (argmax per sector per round, all sectors in parallel).
Per-point suppression reach (how many +-ring-neighbours a pick blocks before
a >gap break) is precomputed once, so each greedy round costs O(sectors * M)
instead of O(capacity) segment reductions — the dominant cost becomes two
O(n log n) sorts instead of 24 full-array segment-max sweeps.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from ...ops.pointcloud import PointCloud, voxel_downsample


@dataclasses.dataclass(frozen=True)
class FeatureExtractionConfig:
    n_scans: int = 64
    min_range: float = 5.0  # MINIMUM_RANGE (KITTI launch: 5)
    scan_period: float = 0.1
    curvature_threshold: float = 0.1
    sharp_per_sector: int = 2
    less_sharp_per_sector: int = 20
    flat_per_sector: int = 4
    n_sectors: int = 6
    less_flat_leaf: float = 0.2  # downSizeFilter leaf (scanRegistration.cpp:389)
    suppress_gap_sq: float = 0.05
    capacity: int = 131072  # padded input size
    max_sharp: int = 1024
    max_less_sharp: int = 8192
    max_flat: int = 2048
    max_less_flat: int = 32768


@flax.struct.dataclass
class ScanFeatures:
    """The five output clouds of scanRegistration (+ring/time channels)."""

    sharp: PointCloud
    less_sharp: PointCloud
    flat: PointCloud
    less_flat: PointCloud
    full: PointCloud  # ring-ordered full cloud
    sharp_ring: jax.Array
    less_sharp_ring: jax.Array
    flat_ring: jax.Array
    less_flat_ring: jax.Array
    sharp_time: jax.Array
    less_sharp_time: jax.Array
    flat_time: jax.Array
    less_flat_time: jax.Array


def _ring_id(points, n_scans: int):
    """Elevation-angle ring formulas (scanRegistration.cpp:169-205).
    Returns (ring int32, valid bool)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    angle = jnp.rad2deg(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    if n_scans == 16:
        ring = jnp.round((angle + 15.0) / 2.0).astype(jnp.int32)
        ok = (ring >= 0) & (ring < 16)
    elif n_scans == 32:
        ring = jnp.round((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        ok = (ring >= 0) & (ring < 32)
    elif n_scans == 64:
        upper = angle >= -8.83
        ring = jnp.where(
            upper,
            jnp.floor((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32),
            32 + jnp.floor((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32),
        )
        # reference keeps angle in [-24.33, 2] and rings < 50 (scanRegistration.cpp:193-202)
        ok = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring < 50)
    else:
        raise ValueError(f"unsupported n_scans {n_scans}")
    return ring, ok


def _relative_time(points, mask, scan_period: float):
    """Azimuth-fraction relative time (scanRegistration.cpp:206-246),
    vectorized: ori unwrapped against the start orientation."""
    ori = -jnp.arctan2(points[:, 1], points[:, 0])
    # startOri from the first valid point, endOri from the last + 2pi
    first = jnp.argmax(mask)  # first True
    last = points.shape[0] - 1 - jnp.argmax(mask[::-1])
    start_ori = ori[first]
    end_ori = ori[last] + 2 * jnp.pi
    span = end_ori - start_ori
    span = jnp.where(span > 3 * jnp.pi, span - 2 * jnp.pi, span)
    span = jnp.where(span < jnp.pi, span + 2 * jnp.pi, span)
    o = ori - start_ori
    o = jnp.where(o < 0, o + 2 * jnp.pi, o)
    rel = jnp.clip(o / jnp.maximum(span, 1e-6), 0.0, 1.0)
    return rel * scan_period


def _compact_topk(points, ring, time, sel_mask, cap: int):
    """Gather selected points into a fixed-size cloud (mask-compact, stable
    order) via cumsum + scatter — cheaper than a stable argsort."""
    idx = jnp.cumsum(sel_mask.astype(jnp.int32)) - 1
    dest = jnp.where(sel_mask & (idx < cap), idx, cap)  # overflow slot dropped
    pts = jnp.zeros((cap + 1, 3), points.dtype).at[dest].set(points)[:cap]
    rng = jnp.zeros((cap + 1,), ring.dtype).at[dest].set(ring)[:cap]
    tim = jnp.zeros((cap + 1,), time.dtype).at[dest].set(time)[:cap]
    total = jnp.minimum(jnp.sum(sel_mask.astype(jnp.int32)), cap)
    ok = jnp.arange(cap) < total
    return (
        PointCloud(points=jnp.where(ok[:, None], pts, 0.0), mask=ok),
        jnp.where(ok, rng, 0),
        jnp.where(ok, tim, 0.0),
    )


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(points, mask, cfg: FeatureExtractionConfig = FeatureExtractionConfig()) -> ScanFeatures:
    n = cfg.capacity
    points = points[:n]
    mask = mask[:n]

    r2 = jnp.sum(points * points, axis=-1)
    mask = mask & (r2 >= cfg.min_range**2) & jnp.all(jnp.isfinite(points), axis=-1)

    ring, ring_ok = _ring_id(points, cfg.n_scans)
    mask = mask & ring_ok
    ring = jnp.where(mask, ring, cfg.n_scans)  # invalid -> overflow ring
    rel_time = _relative_time(points, mask, cfg.scan_period)

    # ring-major stable order (original azimuth order preserved within ring)
    order = jnp.argsort(ring, stable=True)
    pts = points[order]
    msk = mask[order]
    rng_s = ring[order]
    tim = rel_time[order]

    # curvature over +-5 neighbours in ring order (:256-266); invalid at ring
    # boundaries and near invalid points
    acc = -10.0 * pts
    nb_ok = msk
    for k in list(range(-5, 0)) + list(range(1, 6)):
        acc = acc + jnp.roll(pts, -k, axis=0)
        nb_ok = nb_ok & jnp.roll(msk, -k, axis=0) & (jnp.roll(rng_s, -k, axis=0) == rng_s)
    curv = jnp.sum(acc * acc, axis=-1)
    feat_ok = nb_ok  # points whose whole neighbourhood is same-ring & valid

    # per-ring rank -> equal-count sectors (sp/ep arithmetic, :280-292)
    ring_seg = rng_s
    ones = msk.astype(jnp.int32)
    # rank within ring: cumulative count minus segment offset
    cum = jnp.cumsum(ones) - ones
    ring_counts = jax.ops.segment_sum(ones, ring_seg, num_segments=cfg.n_scans + 1)
    ring_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(ring_counts)[:-1].astype(jnp.int32)])
    rank = cum - ring_start[ring_seg]
    cnt = jnp.maximum(ring_counts[ring_seg], 1)
    sector = jnp.clip(cfg.n_sectors * rank // cnt, 0, cfg.n_sectors - 1)
    seg = ring_seg * cfg.n_sectors + sector  # [n] sector id
    n_segs = (cfg.n_scans + 1) * cfg.n_sectors

    # --- suppression reach: a pick at ring position p blocks p+l (l <= Lf[p])
    # and p-l (l <= Lb[p]) — consecutive-gap chain unbroken and same ring
    # (the cloudNeighborPicked marking loop, scanRegistration.cpp:319-342)
    nxt = jnp.roll(pts, -1, axis=0)
    gap_ok_fwd = jnp.sum((nxt - pts) ** 2, axis=-1) <= cfg.suppress_gap_sq  # gap (i, i+1)
    gap_ok_bwd = jnp.roll(gap_ok_fwd, 1, axis=0)  # gap (i-1, i)
    run_f = jnp.ones_like(msk)
    run_b = jnp.ones_like(msk)
    reach_f = jnp.zeros(n, jnp.int32)
    reach_b = jnp.zeros(n, jnp.int32)
    for l in range(1, 6):
        run_f = run_f & jnp.roll(gap_ok_fwd, -(l - 1), axis=0) & (jnp.roll(rng_s, -l, axis=0) == rng_s)
        reach_f = reach_f + run_f
        run_b = run_b & jnp.roll(gap_ok_bwd, l - 1, axis=0) & (jnp.roll(rng_s, l, axis=0) == rng_s)
        reach_b = reach_b + run_b

    # --- candidate compaction: ONE ascending sort by (sector, curvature).
    # Flat candidates are each sector block's head (smallest curvature),
    # corner candidates its tail reversed (largest) — both from the same sort.
    eligible = msk & feat_ok
    curv_nn = jnp.maximum(curv, 0.0)  # kill -0.0 so the bit pattern is monotone
    curv_bits = jax.lax.bitcast_convert_type(curv_nn, jnp.int32)
    seg_or = jnp.where(eligible, seg, n_segs)
    # lexicographic (seg asc, curv asc) via two stable int32 sorts — int64
    # keys are unavailable without x64 mode
    o1 = jnp.argsort(curv_bits)
    order = o1[jnp.argsort(seg_or[o1])]

    elig_counts = jax.ops.segment_sum(
        eligible.astype(jnp.int32), seg_or, num_segments=n_segs + 1
    )
    blk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(elig_counts)[:-1].astype(jnp.int32)]
    )
    blk_end = blk_start + elig_counts
    seg_sorted = seg_or[order]
    curv_sorted = curv_nn[order]
    pos_in_sort = jnp.arange(n, dtype=jnp.int32)
    rank_asc = pos_in_sort - blk_start[seg_sorted]
    rank_desc = blk_end[seg_sorted] - 1 - pos_in_sort

    n_rings = cfg.n_scans + 1
    M_c = 256  # >= 20 picks x (1 pick + 10 suppressed) + cross-sector margin
    M_f = 320  # flats also absorb suppression from the 20 corner picks

    def compact_candidates(cand_ok, rank, m):
        """[n_segs, m] table of ring positions (int32, -1 = empty)."""
        dest = jnp.where(cand_ok & (rank < m), seg_sorted * m + rank, n_segs * m)
        tbl = (
            jnp.full((n_segs * m + 1,), -1, jnp.int32)
            .at[dest]
            .set(order.astype(jnp.int32))[: n_segs * m]
        )
        return tbl.reshape(n_rings, cfg.n_sectors, m)

    in_seg = seg_sorted < n_segs
    corner_cand = compact_candidates(
        in_seg & (curv_sorted > cfg.curvature_threshold), rank_desc, M_c
    )
    flat_cand = compact_candidates(
        in_seg & (curv_sorted < cfg.curvature_threshold), rank_asc, M_f
    )

    def cand_attr(cand_pos, attr, fill):
        safe = jnp.maximum(cand_pos, 0)
        return jnp.where(cand_pos >= 0, attr[safe], fill)

    def greedy_rounds(cand_pos, alive, k: int):
        """k rounds: per sector take the first alive candidate (the table is
        already best-first), then block ring neighbours within its reach —
        the vectorized greedy loop (scanRegistration.cpp:293-385)."""
        lf = cand_attr(cand_pos, reach_f, 0)
        lb = cand_attr(cand_pos, reach_b, 0)

        def round_fn(alive, _):
            has = jnp.any(alive, axis=-1)  # [R, S]
            fi = jnp.argmax(alive, axis=-1)
            take = lambda a: jnp.take_along_axis(a, fi[..., None], axis=-1)[..., 0]
            ppos = jnp.where(has, take(cand_pos), -1)
            plf = take(lf)
            plb = take(lb)
            # picks of all sectors of the SAME ring can suppress a candidate
            # (reach never crosses rings); d==0 removes the pick itself
            d = cand_pos[:, :, :, None] - ppos[:, None, None, :]
            supp = (ppos[:, None, None, :] >= 0) & (
                ((d > 0) & (d <= plf[:, None, None, :]))
                | ((d < 0) & (-d <= plb[:, None, None, :]))
                | (d == 0)
            )
            alive = alive & ~jnp.any(supp, axis=-1)
            return alive, (ppos, has)

        alive, (ppos, pok) = jax.lax.scan(round_fn, alive, None, length=k)
        return alive, ppos, pok  # picks: [k, R, S]

    alive_c = corner_cand >= 0
    _, cpick_pos, cpick_ok = greedy_rounds(corner_cand, alive_c, cfg.less_sharp_per_sector)

    # corner picks suppress flat candidates (shared cloudNeighborPicked state)
    alive_f = flat_cand >= 0
    cp = jnp.swapaxes(cpick_pos, 0, 1).reshape(n_rings, -1)  # [R, k*S]
    cl_f = cand_attr(cp, reach_f, 0)
    cl_b = cand_attr(cp, reach_b, 0)
    d = flat_cand[:, :, :, None] - cp[:, None, None, :]
    supp = (cp[:, None, None, :] >= 0) & (
        ((d > 0) & (d <= cl_f[:, None, None, :]))
        | ((d < 0) & (-d <= cl_b[:, None, None, :]))
    )
    alive_f = alive_f & ~jnp.any(supp, axis=-1)
    _, fpick_pos, fpick_ok = greedy_rounds(flat_cand, alive_f, cfg.flat_per_sector)

    def scatter_sel(pick_pos, pick_ok):
        p = pick_pos.reshape(-1)
        ok = pick_ok.reshape(-1)
        dest = jnp.where(ok & (p >= 0), p, n)
        return jnp.zeros((n + 1,), bool).at[dest].set(True)[:n]

    sharp_sel = scatter_sel(cpick_pos[: cfg.sharp_per_sector], cpick_ok[: cfg.sharp_per_sector])
    less_sharp_sel = scatter_sel(cpick_pos, cpick_ok)
    flat_sel = scatter_sel(fpick_pos, fpick_ok)
    # everything not picked as corner is less-flat (:371-378), incl. flats
    less_flat_sel = msk & ~less_sharp_sel

    sharp, sharp_ring, sharp_time = _compact_topk(pts, rng_s, tim, sharp_sel, cfg.max_sharp)
    lsharp, lsharp_ring, lsharp_time = _compact_topk(pts, rng_s, tim, less_sharp_sel, cfg.max_less_sharp)
    flat, flat_ring, flat_time = _compact_topk(pts, rng_s, tim, flat_sel, cfg.max_flat)
    lflat_cloud, lflat_ring, lflat_time = _compact_topk(pts, rng_s, tim, less_flat_sel, cfg.max_less_flat)
    # less-flat is voxel-downsampled (:386-394). The ring id rides the weight
    # channel through the centroid reduction — the same approximation as
    # PCL's intensity-averaging of scanID in the reference.
    lflat_cloud = lflat_cloud.replace(weights=lflat_ring.astype(jnp.float32))
    lflat = voxel_downsample(lflat_cloud, cfg.less_flat_leaf, out_capacity=cfg.max_less_flat)
    lflat_ring = jnp.round(lflat.get_weights()).astype(jnp.int32)
    lflat_time = jnp.zeros(cfg.max_less_flat, jnp.float32)
    lflat = lflat.replace(weights=None)

    return ScanFeatures(
        sharp=sharp,
        less_sharp=lsharp,
        flat=flat,
        less_flat=lflat,
        full=PointCloud(points=pts, mask=msk),
        sharp_ring=sharp_ring,
        less_sharp_ring=lsharp_ring,
        flat_ring=flat_ring,
        less_flat_ring=lflat_ring,
        sharp_time=sharp_time,
        less_sharp_time=lsharp_time,
        flat_time=flat_time,
        less_flat_time=lflat_time,
    )

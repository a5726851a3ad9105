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

The sequential per-sector curvature sort becomes K rounds of masked
segment-max (argmax per sector per round, all sectors in parallel), which
reproduces the greedy pick+suppress semantics exactly.
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
    """Gather selected points into a fixed-size cloud (mask-compact)."""
    order = jnp.argsort(~sel_mask, stable=True)  # selected first, order kept
    take = order[:cap]
    ok = sel_mask[take]
    return (
        PointCloud(points=jnp.where(ok[:, None], points[take], 0.0), mask=ok),
        jnp.where(ok, ring[take], 0),
        jnp.where(ok, time[take], 0.0),
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

    # gap^2 to the next point in ring order (suppression break condition)
    nxt = jnp.roll(pts, -1, axis=0)
    gap_sq = jnp.sum((nxt - pts) ** 2, axis=-1)
    gap_ok_fwd = gap_sq <= cfg.suppress_gap_sq
    prv = jnp.roll(pts, 1, axis=0)
    gap_ok_bwd = jnp.sum((pts - prv) ** 2, axis=-1) <= cfg.suppress_gap_sq

    def suppress(picked, suppressed):
        """Block +-5 ring neighbours of picked points, stopping at gaps."""
        ok_f = jnp.ones_like(picked)
        ok_b = jnp.ones_like(picked)
        for l in range(1, 6):
            ok_f = ok_f & jnp.roll(gap_ok_fwd, l, axis=0)  # gap between l-1 and l steps back
            hit_f = jnp.roll(picked, l, axis=0) & ok_f
            ok_b = ok_b & jnp.roll(gap_ok_bwd, -l, axis=0)
            hit_b = jnp.roll(picked, -l, axis=0) & ok_b
            same_ring_f = jnp.roll(rng_s, l, axis=0) == rng_s
            same_ring_b = jnp.roll(rng_s, -l, axis=0) == rng_s
            suppressed = suppressed | (hit_f & same_ring_f) | (hit_b & same_ring_b)
        return suppressed

    def greedy_pick(eligible, want_max: bool, k: int, suppressed):
        """K rounds of per-sector argmax (or argmin) + neighbour suppression —
        the vectorized equivalent of the sorted greedy loop (:293-385)."""
        picked_all = jnp.zeros_like(msk)
        key_base = curv if want_max else -curv
        for _ in range(k):
            cand = eligible & ~suppressed & ~picked_all
            key = jnp.where(cand, key_base, -jnp.inf)
            best = jax.ops.segment_max(key, seg, num_segments=n_segs)
            is_best = cand & (key == best[seg]) & jnp.isfinite(key)
            # break ties by lowest position: keep the first occurrence per sector
            first_pos = jax.ops.segment_min(
                jnp.where(is_best, jnp.arange(pts.shape[0]), jnp.int32(2**30)),
                seg,
                num_segments=n_segs,
            )
            pick = is_best & (jnp.arange(pts.shape[0]) == first_pos[seg])
            picked_all = picked_all | pick
            suppressed = suppress(pick, suppressed)
        return picked_all, suppressed

    eligible = msk & feat_ok
    suppressed = jnp.zeros_like(msk)

    sharp_sel, suppressed = greedy_pick(
        eligible & (curv > cfg.curvature_threshold), True, cfg.sharp_per_sector, suppressed
    )
    more_sharp, suppressed = greedy_pick(
        eligible & (curv > cfg.curvature_threshold),
        True,
        cfg.less_sharp_per_sector - cfg.sharp_per_sector,
        suppressed,
    )
    less_sharp_sel = sharp_sel | more_sharp
    flat_sel, suppressed = greedy_pick(
        eligible & (curv < cfg.curvature_threshold), False, cfg.flat_per_sector, suppressed
    )
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

"""Scan-Line-Run (SLR) clustering.

Re-design of slr_clustering_node (src/apps/slr_clustering_node.cpp:83-660,
same paper as GPF): cluster non-ground points by (a) "runs" of consecutive
close points within a scan line (th_run) and (b) merging runs across
adjacent scan lines (th_merge).

The reference's sequential two-pass label/merge algorithm is re-expressed as
connected components over an explicit neighbour graph (ring-predecessor,
ring-successor, nearest point in the ring above within th_merge), solved by
iterative minimum-label propagation — a fixed number of sweeps of pure
gathers, which is the TPU-idiomatic union-find substitute.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud


@dataclasses.dataclass(frozen=True)
class SLRConfig:
    n_scans: int = 64
    th_run: float = 0.5  # same-line run distance gate
    th_merge: float = 1.0  # cross-line merge gate
    propagate_iters: int = 64  # label sweeps (>= graph diameter in rings)
    azimuth_window: int = 8  # cross-ring search half-window (bins)


@partial(jax.jit, static_argnames=("cfg", "n_azimuth"))
def slr_cluster(points, mask, ring, n_azimuth: int, cfg: SLRConfig = SLRConfig()):
    """Cluster an ORGANIZED sweep (ring-major, n_azimuth points per ring).

    Args:
      points: [n_scans * n_azimuth, 3] in ring-major azimuth order.
      mask: [N] validity.
      ring: [N] int32 ring ids (row index in the organized layout).
    Returns:
      labels [N] int32 — cluster id (its smallest member index), -1 invalid.
    """
    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    # --- same-ring run links (find_runs_): consecutive azimuth neighbours
    nxt = jnp.roll(idx, -1)
    same_ring_n = (ring[nxt] == ring) & mask & mask[nxt]
    d_next = jnp.linalg.norm(points[nxt] - points, axis=-1)
    link_next = same_ring_n & (d_next < cfg.th_run)

    # --- cross-ring merge links (update_labels_): nearest in-window point on
    # the ring above
    col = idx % n_azimuth
    up = idx - n_azimuth  # same azimuth bin, previous ring
    offsets = jnp.arange(-cfg.azimuth_window, cfg.azimuth_window + 1)
    cand = up[:, None] + offsets[None, :]
    cand_ok = (cand >= 0) & (cand < n)
    cand = jnp.clip(cand, 0, n - 1)
    cand_ok = cand_ok & mask[cand] & (ring[cand] == ring[:, None] - 1) & mask[:, None]
    d_up = jnp.linalg.norm(points[cand] - points[:, None, :], axis=-1)
    d_up = jnp.where(cand_ok, d_up, jnp.inf)
    j_up = jnp.argmin(d_up, axis=-1)
    best_up = jnp.take_along_axis(cand, j_up[:, None], axis=-1)[:, 0]
    link_up = jnp.isfinite(jnp.min(d_up, axis=-1)) & (
        jnp.min(d_up, axis=-1) < cfg.th_merge
    )

    # --- iterative min-label propagation over the 3-neighbour graph
    labels0 = jnp.where(mask, idx, jnp.int32(n))

    def sweep(labels, _):
        l_next = jnp.where(link_next, labels[nxt], n)
        prv = jnp.roll(idx, 1)
        link_prev = jnp.roll(link_next, 1)
        l_prev = jnp.where(link_prev, labels[prv], n)
        l_up = jnp.where(link_up, labels[best_up], n)
        # down-links are the transpose of up-links: scatter-min labels upward
        down_target = jnp.where(link_up, best_up, n)
        l_down = jax.ops.segment_min(
            jnp.where(link_up, labels, n), jnp.where(link_up, best_up, 0), num_segments=n + 1
        )[:-1]
        l_down = jnp.where(jnp.arange(n) < n, l_down, n)
        new = jnp.minimum(jnp.minimum(labels, l_next), jnp.minimum(l_prev, jnp.minimum(l_up, l_down)))
        # pointer-jumping doubling: adopt the label of your label
        new = jnp.minimum(new, new[jnp.clip(new, 0, n - 1)])
        return new, None

    labels, _ = jax.lax.scan(sweep, labels0, None, length=cfg.propagate_iters)
    return jnp.where(mask, labels, -1)


def cluster_sizes(labels, num_segments: int):
    """Histogram of cluster sizes (for filtering small clusters)."""
    ok = labels >= 0
    return jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.where(ok, labels, 0), num_segments=num_segments
    )

"""Scan Context place-recognition descriptor and retrieval.

Re-design of SCManager (src/mapping/loop_closing/scan_context.cpp:5-349):
a 20-ring x 60-sector polar max-height descriptor, ring-key candidate
retrieval, and column-shift (yaw) aligned distance.

TPU-native differences:
- descriptor binning is one `segment_max` scatter (vs per-point loops);
- retrieval is a masked top-k over ring-key L2 distances against the whole
  history in one batched op (replaces the incrementally rebuilt nanoflann
  kd-tree, scan_context.cpp:261-284 — no rebuild-every-10 staleness);
- the yaw alignment evaluates ALL 60 column shifts in one batched einsum
  (the reference's coarse sector-key argmin + ±10% fine search,
  :86-140, is an approximation of exactly this full search).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScanContextConfig:
    """Constants from scan_context.h:85-102."""

    num_rings: int = 20
    num_sectors: int = 60
    max_radius: float = 80.0
    lidar_height: float = 2.0
    num_exclude_recent: int = 50
    num_candidates: int = 10
    search_ratio: float = 0.1  # kept for reference parity; full search is used
    dist_threshold: float = 0.5  # SC_DIST_THRES


@partial(jax.jit, static_argnames=("cfg",))
def make_scancontext(points, mask, cfg: ScanContextConfig = ScanContextConfig()):
    """Build the [rings, sectors] max-z descriptor (makeScancontext,
    scan_context.cpp:142-186). Empty bins are 0."""
    r = jnp.linalg.norm(points[:, :2], axis=-1)
    theta = jnp.arctan2(points[:, 1], points[:, 0])  # [-pi, pi]
    theta = jnp.where(theta < 0, theta + 2 * jnp.pi, theta)
    z = points[:, 2] + cfg.lidar_height

    ok = mask & (r < cfg.max_radius) & (r > 1e-3)
    ring = jnp.clip((r / cfg.max_radius * cfg.num_rings).astype(jnp.int32), 0, cfg.num_rings - 1)
    sector = jnp.clip(
        (theta / (2 * jnp.pi) * cfg.num_sectors).astype(jnp.int32), 0, cfg.num_sectors - 1
    )
    bins = ring * cfg.num_sectors + sector
    bins = jnp.where(ok, bins, cfg.num_rings * cfg.num_sectors)  # overflow bin

    z = jnp.where(ok, z, -jnp.inf)
    desc = jax.ops.segment_max(
        z, bins, num_segments=cfg.num_rings * cfg.num_sectors + 1
    )[:-1]
    desc = jnp.where(jnp.isfinite(desc), desc, 0.0)
    return desc.reshape(cfg.num_rings, cfg.num_sectors)


def ring_key(desc):
    """Row means (makeRingkeyFromScancontext, scan_context.cpp:188-200)."""
    return jnp.mean(desc, axis=-1)


def sector_key(desc):
    """Column means (makeSectorkeyFromScancontext, :202-216)."""
    return jnp.mean(desc, axis=-2)


@jax.jit
def sc_distance(desc_a, desc_b):
    """Min over all column shifts of the mean column-wise cosine distance
    (distanceBtnScanContext, scan_context.cpp:86-140), for all shifts at once.

    Returns (distance, best_shift).
    """
    nr, ns = desc_a.shape
    # all circular shifts of b: shifted[s, :, j] = b[:, (j + s) % ns]
    idx = (jnp.arange(ns)[None, :] + jnp.arange(ns)[:, None]) % ns
    shifted = desc_b[:, idx]  # [nr, ns(shift), ns(col)] -> careful with axes
    shifted = jnp.transpose(shifted, (1, 0, 2))  # [shift, nr, col]

    a = desc_a[None, :, :]  # [1, nr, col]
    num = jnp.sum(a * shifted, axis=1)  # [shift, col]
    na = jnp.linalg.norm(desc_a, axis=0)  # [col]
    nb = jnp.linalg.norm(shifted, axis=1)  # [shift, col]
    valid = (na[None, :] > 1e-9) & (nb > 1e-9)
    cos = jnp.where(valid, num / jnp.maximum(na[None, :] * nb, 1e-9), 0.0)
    n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    dist = 1.0 - jnp.sum(cos, axis=-1) / n_valid  # [shift]
    best = jnp.argmin(dist)
    return dist[best], best


@partial(jax.jit, static_argnames=("cfg",))
def detect_loop(
    query_desc,  # [nr, ns]
    query_rk,  # [nr]
    history_desc,  # [K, nr, ns]
    history_rk,  # [K, nr]
    history_valid,  # [K] bool, already excludes recent frames
    cfg: ScanContextConfig = ScanContextConfig(),
):
    """Top-`num_candidates` ring-key neighbours, full SC distance on each,
    accept the best under threshold (detectLoopClosureID, :251-348).

    Returns (loop_index int32 [-1 if none], distance, yaw_shift_sectors).
    """
    d_rk = jnp.linalg.norm(history_rk - query_rk[None, :], axis=-1)
    d_rk = jnp.where(history_valid, d_rk, jnp.inf)
    _, cand = jax.lax.top_k(-d_rk, cfg.num_candidates)

    def one(c):
        return sc_distance(query_desc, history_desc[c])

    dists, shifts = jax.vmap(one)(cand)
    dists = jnp.where(jnp.isfinite(d_rk[cand]), dists, jnp.inf)
    best = jnp.argmin(dists)
    ok = dists[best] < cfg.dist_threshold
    return (
        jnp.where(ok, cand[best], -1).astype(jnp.int32),
        dists[best],
        shifts[best].astype(jnp.int32),
    )


class SCManager:
    """Host-side descriptor store (makeAndSaveScancontextAndKeys +
    detectLoopClosureID API)."""

    def __init__(self, cfg: ScanContextConfig = ScanContextConfig(), capacity: int = 4096):
        self.cfg = cfg
        self.capacity = capacity
        # the retrieval history lives ON DEVICE and is updated in place per
        # add — re-uploading the whole [cap, 20, 60] store per detect cost
        # ~200 ms of pure transport at cap 4096 on the tunneled backend.
        # `self.descs` is a lazily-refreshed host mirror for PNG export and
        # persistence only.
        self._descs_dev = jnp.zeros((capacity, cfg.num_rings, cfg.num_sectors), jnp.float32)
        self._rk_dev = jnp.zeros((capacity, cfg.num_rings), jnp.float32)
        self._descs_host = np.zeros((capacity, cfg.num_rings, cfg.num_sectors), np.float32)
        self._host_count = 0  # rows of the host mirror that are current
        self.count = 0

    @property
    def descs(self) -> np.ndarray:
        if self._host_count < self.count:
            self._descs_host[self._host_count : self.count] = np.asarray(
                self._descs_dev[self._host_count : self.count]
            )
            self._host_count = self.count
        return self._descs_host

    @property
    def ring_keys(self) -> np.ndarray:
        return np.asarray(self._rk_dev[: self.count])

    def add(self, points, mask) -> np.ndarray:
        if self.count >= self.capacity:
            # grow by doubling (like PoseGraphBuilder): unbounded mapping runs
            # must not hard-fail; the retrieval kernel retraces once per
            # doubling, which amortizes to nothing
            self.descs  # flush the host mirror before growing
            new_cap = self.capacity * 2
            self._descs_dev = jnp.concatenate(
                [self._descs_dev, jnp.zeros_like(self._descs_dev)], axis=0
            )
            self._rk_dev = jnp.concatenate(
                [self._rk_dev, jnp.zeros_like(self._rk_dev)], axis=0
            )
            self._descs_host = np.concatenate(
                [self._descs_host, np.zeros_like(self._descs_host)], axis=0
            )
            self.capacity = new_cap
        desc = make_scancontext(jnp.asarray(points), jnp.asarray(mask), self.cfg)
        self._descs_dev = self._descs_dev.at[self.count].set(desc)
        self._rk_dev = self._rk_dev.at[self.count].set(ring_key(desc))
        self.count += 1
        return np.asarray(desc)

    def save_descriptor_png(self, index: int, path: str) -> None:
        """Write descriptor `index` as a grayscale PNG — the per-keyframe
        image dump of loop_closing.cpp:136-137 (cv::imwrite)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        d = self.descs[index]
        hi = max(float(d.max()), 1e-6)
        plt.imsave(path, d / hi, cmap="gray", vmin=0.0, vmax=1.0)

    def detect(self):
        """Loop candidate for the most recent descriptor.
        Returns (index or -1, distance, yaw_rad)."""
        if self.count < 2:
            return -1, float("inf"), 0.0
        q = self.count - 1
        # the reference searches the first (count - num_exclude_recent)
        # descriptors, i.e. [0, count - N) (scan_context.cpp:261-274) — using
        # q here would always exclude one extra (the newest eligible) entry
        hi = max(0, self.count - self.cfg.num_exclude_recent)
        if hi == 0:
            return -1, float("inf"), 0.0
        # everything stays on device; the three result scalars travel in ONE
        # device_get (separate int()/float() reads cost a ~30 ms transport
        # round trip EACH on tunneled backends — measured 68.8 ms/detect of
        # which compute was 2.5 ms)
        idx, dist, shift = jax.device_get(
            detect_loop(
                self._descs_dev[q],
                self._rk_dev[q],
                self._descs_dev,
                self._rk_dev,
                jnp.arange(self.capacity, dtype=jnp.int32) < jnp.int32(hi),
                self.cfg,
            )
        )
        yaw = float(shift) * 2.0 * np.pi / self.cfg.num_sectors
        return int(idx), float(dist), yaw

"""Incremental NDT map maintenance (NDTMapSums) — stats parity vs full
rebuild, eviction exactness, and window recentering.

The reference grows/re-indexes its voxel grid incrementally
(VoxelGrid::update, VoxelGrid.cpp:545-809); our TPU-native equivalent keeps
dense running moments on a fixed lattice (models/registration/ndt.py
NDTMapSums). These tests pin the contract: an incrementally maintained map
is numerically the same map a full rebuild would produce.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_slam_tpu.ops import PointCloud
from lidar_slam_tpu.models.registration import (
    NDTConfig,
    build_ndt_map,
    empty_ndt_sums,
    scatter_to_sums,
    recenter_ndt_sums,
    finalize_ndt_sums,
)

CFG = NDTConfig(grid_dims=(32, 32, 16), point_chunk=1024)
ORIGIN = jnp.asarray([-16.0, -16.0, -8.0])


def blobs(n_blobs, seed, shift=(0.0, 0.0, 0.0)):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(n_blobs, 3)).astype(np.float32) + np.float32(shift)
    centers[:, 2] = rng.uniform(-2, 4, size=n_blobs)
    pts = []
    for c in centers:
        A = rng.normal(size=(3, 3)).astype(np.float32) * np.float32([0.3, 0.3, 0.05])
        pts.append(c + rng.normal(size=(40, 3)).astype(np.float32) @ A)
    return np.concatenate(pts)


def assert_maps_close(m_inc, m_full, atol=1e-4):
    np.testing.assert_array_equal(np.asarray(m_inc.count), np.asarray(m_full.count))
    np.testing.assert_array_equal(np.asarray(m_inc.valid), np.asarray(m_full.valid))
    valid = np.asarray(m_full.valid)
    np.testing.assert_allclose(
        np.asarray(m_inc.mean)[valid], np.asarray(m_full.mean)[valid], atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(m_inc.icov)[valid], np.asarray(m_full.icov)[valid], atol=5e-2, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(m_inc.staticvalue)[valid], np.asarray(m_full.staticvalue)[valid], atol=atol
    )


class TestIncrementalParity:
    def test_two_adds_match_full_build(self):
        a, b = blobs(12, 0), blobs(12, 1)
        wa = np.random.default_rng(3).uniform(0.2, 1.0, len(a)).astype(np.float32)
        wb = np.ones(len(b), np.float32)

        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool), jnp.asarray(wa))
        sums = scatter_to_sums(sums, jnp.asarray(b), jnp.ones(len(b), bool), jnp.asarray(wb))
        m_inc = finalize_ndt_sums(sums, CFG)

        both = PointCloud.from_points(
            np.concatenate([a, b]), weights=np.concatenate([wa, wb])
        )
        m_full = build_ndt_map(both, CFG, origin=ORIGIN)
        assert_maps_close(m_inc, m_full)

    def test_evict_restores_previous_map(self):
        a, b = blobs(12, 0), blobs(12, 1)
        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool))
        sums = scatter_to_sums(sums, jnp.asarray(b), jnp.ones(len(b), bool))
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool), sign=-1.0)
        m_inc = finalize_ndt_sums(sums, CFG)

        m_b = build_ndt_map(PointCloud.from_points(b), CFG, origin=ORIGIN)
        assert_maps_close(m_inc, m_b)

    def test_masked_points_ignored(self):
        a = blobs(8, 2)
        mask = np.ones(len(a), bool)
        mask[::3] = False
        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.asarray(mask))
        m_inc = finalize_ndt_sums(sums, CFG)
        m_full = build_ndt_map(
            PointCloud.from_points(a[mask]), CFG, origin=ORIGIN
        )
        assert_maps_close(m_inc, m_full)

    def test_out_of_bounds_points_dropped(self):
        a = blobs(8, 4)
        far = a + np.float32([1000.0, 0.0, 0.0])
        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(
            sums, jnp.asarray(np.concatenate([a, far])),
            jnp.ones(2 * len(a), bool),
        )
        m_inc = finalize_ndt_sums(sums, CFG)
        m_full = build_ndt_map(PointCloud.from_points(a), CFG, origin=ORIGIN)
        assert_maps_close(m_inc, m_full)


class TestRecenter:
    def test_recenter_matches_rebuild_at_new_origin(self):
        a = blobs(16, 5)
        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool))
        new_origin = ORIGIN + jnp.asarray([3.0, -2.0, 1.0])  # lattice multiples
        sums = recenter_ndt_sums(sums, new_origin)
        m_inc = finalize_ndt_sums(sums, CFG)

        m_full = build_ndt_map(PointCloud.from_points(a), CFG, origin=new_origin)
        assert_maps_close(m_inc, m_full)

    def test_add_recenter_evict_consistent(self):
        """A keyframe added before a recenter can be evicted after it: cells
        rolled out of the window were zeroed, and their points fall out of
        bounds at evict time, so the subtraction stays consistent."""
        a, b = blobs(10, 6), blobs(10, 7)
        sums = empty_ndt_sums(ORIGIN, CFG)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool))
        sums = scatter_to_sums(sums, jnp.asarray(b), jnp.ones(len(b), bool))
        new_origin = ORIGIN + jnp.asarray([5.0, 0.0, 0.0])
        sums = recenter_ndt_sums(sums, new_origin)
        sums = scatter_to_sums(sums, jnp.asarray(a), jnp.ones(len(a), bool), sign=-1.0)
        m_inc = finalize_ndt_sums(sums, CFG)

        # full rebuild of b alone on the new window
        m_full = build_ndt_map(PointCloud.from_points(b), CFG, origin=new_origin)
        assert_maps_close(m_inc, m_full)

    def test_recenter_under_jit(self):
        a = blobs(6, 8)

        @jax.jit
        def go(pts, new_origin):
            sums = empty_ndt_sums(ORIGIN, CFG)
            sums = scatter_to_sums(sums, pts, jnp.ones(pts.shape[0], bool))
            sums = recenter_ndt_sums(sums, new_origin)
            return finalize_ndt_sums(sums, CFG)

        m = go(jnp.asarray(a), ORIGIN + jnp.asarray([2.0, 2.0, 0.0]))
        assert np.isfinite(np.asarray(m.packed)).all()


class TestLongRunDrift:
    def test_many_add_evict_cycles_stay_exact(self):
        """Sliding-window churn: 30 add+evict cycles; the surviving window's
        stats must still match a from-scratch rebuild (count exactly,
        moments to float32 tolerance)."""
        clouds = [blobs(6, 100 + i) for i in range(36)]
        window = 6
        sums = empty_ndt_sums(ORIGIN, CFG)
        for i, c in enumerate(clouds):
            sums = scatter_to_sums(sums, jnp.asarray(c), jnp.ones(len(c), bool))
            if i >= window:
                old = clouds[i - window]
                sums = scatter_to_sums(
                    sums, jnp.asarray(old), jnp.ones(len(old), bool), sign=-1.0
                )
        m_inc = finalize_ndt_sums(sums, CFG)
        live = np.concatenate(clouds[-window:])
        m_full = build_ndt_map(PointCloud.from_points(live), CFG, origin=ORIGIN)
        assert_maps_close(m_inc, m_full, atol=5e-4)


class TestCoarsenSums:
    """coarsen_ndt_sums: the derived 2x grid must match an independently
    scattered one (same points, coarse lattice) to float rounding."""

    def test_matches_direct_coarse_scatter(self):
        from lidar_slam_tpu.models.registration import (
            NDTConfig, coarsen_ndt_sums, empty_ndt_sums, scatter_to_sums,
        )

        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(2.0, 30.0, size=(4096, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random(4096) < 0.9)
        w = jnp.asarray(rng.uniform(0.2, 1.0, 4096).astype(np.float32))
        fine_cfg = NDTConfig(resolution=1.0, grid_dims=(32, 32, 32))
        coarse_cfg = NDTConfig(resolution=2.0, grid_dims=(16, 16, 16))
        origin = jnp.zeros(3)  # on the coarse (2*res) lattice

        fine = scatter_to_sums(empty_ndt_sums(origin, fine_cfg), pts, mask, w)
        derived = coarsen_ndt_sums(fine)
        direct = scatter_to_sums(empty_ndt_sums(origin, coarse_cfg), pts, mask, w)

        np.testing.assert_allclose(np.asarray(derived.count), np.asarray(direct.count))
        np.testing.assert_allclose(np.asarray(derived.wsum), np.asarray(direct.wsum), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(derived.psum), np.asarray(direct.psum), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(derived.ppsum), np.asarray(direct.ppsum), rtol=1e-3, atol=1e-2
        )
        assert derived.dims == (16, 16, 16)
        assert derived.resolution == 2.0

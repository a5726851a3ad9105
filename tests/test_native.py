import os

import numpy as np
import pytest

from lidar_slam_tpu.native import (
    native_available,
    voxel_downsample_native,
    read_velodyne_bin_native,
    NativePrefetcher,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built (sh runtime/build.sh)"
)


class TestNativeVoxel:
    def test_matches_jax_voxel_count(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from lidar_slam_tpu.ops import PointCloud, voxel_downsample, finite_mask, range_mask

        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, (20000, 4)).astype(np.float32)
        pts[::40] = np.nan
        out, msk, n = voxel_downsample_native(pts, leaf=0.5, capacity=32768, min_range=1.0, max_range=100.0)
        m = finite_mask(jnp.asarray(pts[:, :3])) & range_mask(jnp.asarray(pts[:, :3]), 1.0, 100.0)
        cloud = PointCloud(points=jnp.where(m[:, None], jnp.asarray(pts[:, :3]), 0.0), mask=m)
        ref = voxel_downsample(cloud, 0.5, out_capacity=32768)
        assert n == int(ref.num_valid())
        assert msk.sum() == n
        # centroid sets identical (order-independent compare via sorting)
        a = np.asarray(ref.points)[np.asarray(ref.mask)]
        b = out[msk]
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_range_and_nan_filtering(self):
        pts = np.array(
            [[0.1, 0, 0, 0], [50, 0, 0, 0], [np.nan, 0, 0, 0], [5, 0, 0, 0]], np.float32
        )
        out, msk, n = voxel_downsample_native(pts, leaf=1.0, capacity=8, min_range=1.0, max_range=10.0)
        assert n == 1
        np.testing.assert_allclose(out[msk][0], [5, 0, 0], atol=1e-6)


class TestNativeIO:
    def test_bin_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        scan = rng.normal(size=(1000, 4)).astype(np.float32)
        p = str(tmp_path / "scan.bin")
        scan.tofile(p)
        back = read_velodyne_bin_native(p)
        np.testing.assert_allclose(back, scan, atol=0)

    def test_prefetcher_order_and_content(self, tmp_path):
        rng = np.random.default_rng(2)
        paths = []
        scans = []
        for i in range(4):
            s = rng.uniform(2, 20, (5000, 4)).astype(np.float32)
            s[:, 1] = i  # tag frames by y so order is checkable
            p = str(tmp_path / f"{i:06d}.bin")
            s.tofile(p)
            paths.append(p)
            scans.append(s)
        pf = NativePrefetcher(paths, leaf=0.1, capacity=16384, min_range=0.5, n_threads=3, lookahead=2)
        for i in range(4):
            pts, msk, n = pf.next()
            assert n > 0
            np.testing.assert_allclose(pts[msk][:, 1], i, atol=0.2)
        assert pf.next() is None
        pf.close()

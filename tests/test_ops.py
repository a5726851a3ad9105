import numpy as np
import jax
import jax.numpy as jnp

from lidar_slam_tpu.ops import (
    PointCloud,
    sym_eigh3,
    finite_mask,
    range_mask,
    voxel_downsample,
    box_crop_mask,
    rotated_box_mask,
    build_bucket_grid,
    knn_query,
)


class TestEigh3:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        B = rng.normal(size=(128, 3, 3)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2)  # SPD-ish
        evals, evecs = sym_eigh3(jnp.asarray(A))
        evals = np.asarray(evals)
        evecs = np.asarray(evecs)
        ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(evals, ref, rtol=1e-3, atol=1e-3)
        # A v = lambda v
        for k in range(3):
            av = np.einsum("nij,nj->ni", A, evecs[:, :, k])
            lv = evals[:, k, None] * evecs[:, :, k]
            np.testing.assert_allclose(av, lv, rtol=1e-2, atol=1e-2)

    def test_degenerate_isotropic(self):
        A = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
        evals, evecs = sym_eigh3(A)
        np.testing.assert_allclose(np.asarray(evals), 2.0, atol=1e-5)
        eye = np.einsum("nij,nkj->nik", np.asarray(evecs), np.asarray(evecs))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)


class TestMasks:
    def test_finite_and_range(self):
        pts = jnp.asarray([[0.1, 0, 0], [np.nan, 0, 0], [10, 0, 0], [100, 0, 0]])
        fm = np.asarray(finite_mask(pts))
        assert list(fm) == [True, False, True, True]
        rm = np.asarray(range_mask(pts, min_range=1.0, max_range=50.0))
        assert list(rm) == [False, False, True, False]

    def test_box_crop(self):
        pts = jnp.asarray([[0, 0, 0], [2, 0, 0], [-2, 0, 0]], jnp.float32)
        m = np.asarray(box_crop_mask(pts, [-1, -1, -1], [1, 1, 1]))
        assert list(m) == [True, False, False]

    def test_rotated_box(self):
        # Box rotated 45deg: point at (1.2, 0, 0) is outside an axis-aligned
        # unit box but inside the rotated box along its diagonal axis.
        boxes = jnp.asarray([[0, 0, 0, 4.0, 0.5, 2.0, np.pi / 4]], jnp.float32)
        pts = jnp.asarray([[1.2, 1.2, 0.0], [1.2, -1.2, 0.0], [0, 0, 0]], jnp.float32)
        m = np.asarray(rotated_box_mask(pts, boxes))[0]
        assert list(m) == [True, False, True]


class TestVoxelDownsample:
    def test_centroids(self):
        pts = np.array(
            [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.1, 5.1, 5.1], [np.nan, 0, 0]],
            np.float32,
        )
        cloud = PointCloud(points=jnp.asarray(np.nan_to_num(pts)), mask=jnp.asarray([True, True, True, False]))
        out = voxel_downsample(cloud, 1.0)
        got = np.asarray(out.points)[np.asarray(out.mask)]
        got = got[np.lexsort(got.T)]
        expected = np.array([[0.2, 0.2, 0.2], [5.1, 5.1, 5.1]], np.float32)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_weight_mean(self):
        pts = jnp.asarray([[0.1, 0, 0], [0.2, 0, 0]], jnp.float32)
        cloud = PointCloud(points=pts, mask=jnp.ones(2, bool), weights=jnp.asarray([1.0, 0.0]))
        out = voxel_downsample(cloud, 1.0)
        w = np.asarray(out.weights)[np.asarray(out.mask)]
        np.testing.assert_allclose(w, [0.5], atol=1e-6)

    def test_jit_and_count(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-10, 10, size=(5000, 3)).astype(np.float32)
        cloud = PointCloud.from_points(pts, capacity=8192)
        f = jax.jit(lambda c: voxel_downsample(c, 2.0))
        out = f(cloud)
        # compare voxel count to numpy reference
        vids = np.floor(pts / 2.0).astype(np.int64)
        n_expected = len(np.unique(vids, axis=0))
        assert int(out.num_valid()) == n_expected


class TestBucketGridKNN:
    def _brute_knn(self, targets, queries, k, max_r):
        d = np.linalg.norm(targets[None] - queries[:, None], axis=-1)
        d[d > max_r] = np.inf
        idx = np.argsort(d, axis=1)[:, :k]
        return idx, np.take_along_axis(d, idx, axis=1)

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(2)
        targets = rng.uniform(-8, 8, size=(500, 3)).astype(np.float32)
        queries = rng.uniform(-8, 8, size=(100, 3)).astype(np.float32)
        cloud = PointCloud.from_points(targets)
        grid = build_bucket_grid(cloud, cell_size=2.0, dims=(16, 16, 16), origin=jnp.asarray([-16.0, -16.0, -16.0]))
        idx, dist, ok = knn_query(grid, jnp.asarray(queries), k=3, max_radius=2.0, bucket_k=32, chunk=64)
        idx, dist, ok = np.asarray(idx), np.asarray(dist), np.asarray(ok)
        bidx, bdist = self._brute_knn(targets, queries, 3, 2.0)
        for i in range(len(queries)):
            for j in range(3):
                if np.isfinite(bdist[i, j]):
                    assert ok[i, j], (i, j)
                    np.testing.assert_allclose(dist[i, j], bdist[i, j], atol=1e-5)
                    assert idx[i, j] == bidx[i, j]
                else:
                    assert not ok[i, j]

    def test_masked_targets_excluded(self):
        targets = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
        cloud = PointCloud(points=jnp.asarray(targets), mask=jnp.asarray([True, False]))
        grid = build_bucket_grid(cloud, cell_size=1.0, dims=(8, 8, 8), origin=jnp.asarray([-4.0, -4.0, -4.0]))
        idx, dist, ok = knn_query(grid, jnp.asarray([[0.05, 0.0, 0.0]]), k=2, max_radius=1.0, bucket_k=8, chunk=1)
        assert np.asarray(ok)[0, 0]
        assert int(np.asarray(idx)[0, 0]) == 0
        assert not np.asarray(ok)[0, 1]


class TestVoxelDownsampleDense:
    def test_matches_sorted_variant(self):
        """The dense-grid (sort-free) variant must agree with the exact
        sort-based downsample in content AND output order (both emit voxels
        in x-major flat-id order) for bounded inputs."""
        import numpy as np

        from lidar_slam_tpu.ops.pointcloud import (
            PointCloud,
            voxel_downsample,
            voxel_downsample_dense,
        )

        rng = np.random.default_rng(0)
        pts = rng.uniform(-40, 40, (20000, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 10, 20000)
        mask = rng.uniform(size=20000) > 0.1
        w = rng.uniform(0, 1, 20000).astype(np.float32)
        c = PointCloud(
            points=jnp.asarray(pts), mask=jnp.asarray(mask), weights=jnp.asarray(w)
        )
        a = voxel_downsample(c, 0.5, out_capacity=16384)
        b = voxel_downsample_dense(c, 0.5, out_capacity=16384)
        na, nb = int(a.mask.sum()), int(b.mask.sum())
        assert na == nb
        pa = np.asarray(a.points)[np.asarray(a.mask)]
        pb = np.asarray(b.points)[np.asarray(b.mask)]
        np.testing.assert_allclose(pa, pb, atol=1e-5)
        wa = np.asarray(a.weights)[np.asarray(a.mask)]
        wb = np.asarray(b.weights)[np.asarray(b.mask)]
        np.testing.assert_allclose(wa, wb, atol=1e-5)

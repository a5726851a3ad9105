import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.ops.pallas.ndt_reduce import gather_stats_onehot
from lidar_slam_tpu.ops import PointCloud
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_derivatives
from tests.test_ndt import make_scene


class TestOnehotGather:
    def test_matches_direct_indexing(self):
        rng = np.random.default_rng(0)
        c, f = 256, 16
        keys = np.full(c, -1, np.int32)
        used = rng.choice(10_000, 200, replace=False).astype(np.int32)
        keys[:200] = used
        table = rng.normal(size=(c, f)).astype(np.float32)
        table[200:] = 0.0

        # queries: mix of present ids, absent ids, and the -2 padding id
        q_present = rng.choice(used, 300)
        q_absent = (rng.integers(10_000, 20_000, 60)).astype(np.int32)
        q = np.concatenate([q_present, q_absent, np.full(24, -2, np.int32)])
        rng.shuffle(q)
        vids = q.reshape(-1, 8).astype(np.int32)

        out = np.asarray(
            gather_stats_onehot(jnp.asarray(keys), jnp.asarray(table), jnp.asarray(vids), interpret=True)
        )
        # reference: linear scan per id
        lut = {int(k): table[i] for i, k in enumerate(keys) if k >= 0}
        for i in range(vids.shape[0]):
            for j in range(vids.shape[1]):
                expect = lut.get(int(vids[i, j]), np.zeros(f, np.float32))
                np.testing.assert_allclose(out[i, j], expect, atol=1e-6)

    def test_ndt_derivatives_onehot_equals_two_level(self):
        """The full derivative evaluation must be identical under both fetch
        paths (interpret-mode pallas on CPU)."""
        import lidar_slam_tpu.ops.pallas.ndt_reduce as nr

        # route the in-kernel call through interpret mode on CPU
        orig = nr.gather_stats_onehot

        def interp(keys, table, vids, tile=16, interpret=False):
            return orig(keys, table, vids, tile=tile, interpret=True)

        nr.gather_stats_onehot = interp
        try:
            pts = make_scene(20, 50, seed=1)
            target = PointCloud.from_points(pts)
            cfg2 = NDTConfig(grid_dims=(32, 32, 16), point_chunk=512, max_compact_voxels=1024)
            cfg1 = NDTConfig(
                grid_dims=(32, 32, 16), point_chunk=512, max_compact_voxels=1024, gather="onehot"
            )
            m = build_ndt_map(target, cfg2, origin=jnp.asarray([-16.0, -16.0, -8.0]))
            src = jnp.asarray(pts[:400])
            mask = jnp.ones(400, bool)
            pose = jnp.asarray([0.05, -0.03, 0.02, 0.01, -0.02, 0.03], jnp.float32)
            s2, g2, h2 = ndt_derivatives(m, src, mask, pose, cfg2, True)
            s1, g1, h1 = ndt_derivatives(m, src, mask, pose, cfg1, True)
            np.testing.assert_allclose(float(s1), float(s2), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4, atol=1e-4)
        finally:
            nr.gather_stats_onehot = orig

"""Compiled-kernel exactness check — runs on a REAL TPU (not interpret mode).

Executed by tests/test_tpu_compiled.py when RUN_TPU_TESTS=1 (and by hand:
`python tests/tpu_kernel_check.py`). The pytest suite forces JAX_PLATFORMS=cpu
(conftest), where Pallas kernels run in interpret mode only; this script is
the tier that proves the Mosaic-compiled kernels match the XLA reference
bit-for-tolerance on hardware. Small shapes keep the remote compile < 2 min.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align, ndt_derivatives
    from lidar_slam_tpu.models.registration.ndt import sort_points_by_vid
    from lidar_slam_tpu.ops import PointCloud

    devs = jax.devices()
    print(f"devices: {devs}", file=sys.stderr)
    assert any(d.platform != "cpu" for d in devs), "no accelerator present"

    rng = np.random.default_rng(0)
    centers = rng.uniform(-12, 12, size=(48, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(-2, 4, size=48)
    pts = np.concatenate(
        [c + rng.normal(size=(48, 3)).astype(np.float32) * [0.3, 0.3, 0.06] for c in centers]
    )
    cfg = NDTConfig(grid_dims=(32, 32, 16), point_chunk=1024, max_iter=10, gather="fused")
    target = PointCloud.from_points(pts)
    m = build_ndt_map(target, cfg, origin=jnp.asarray([-16.0, -16.0, -8.0]))

    src = PointCloud.from_points(pts[:1024] + np.float32([0.15, -0.1, 0.02]), capacity=1024)
    pose6 = jnp.asarray([0.05, -0.02, 0.0, 0.01, 0.0, -0.01], jnp.float32)
    T0 = jnp.eye(4)

    sp, sm, sw = sort_points_by_vid(m, src.points, src.mask, src.get_weights(), T0)
    s_f, g_f, h_f, u_f = jax.jit(
        lambda: ndt_derivatives(m, sp, sm, pose6, cfg, True, weights=sw, return_unresolved=True)
    )()
    cfg_x = NDTConfig(grid_dims=(32, 32, 16), point_chunk=1024, max_iter=10, gather="two_level")
    s_x, g_x, h_x = jax.jit(
        lambda: ndt_derivatives(m, sp, sm, pose6, cfg_x, True, weights=sw)
    )()
    s_f, g_f, h_f, u_f, s_x, g_x, h_x = jax.device_get((s_f, g_f, h_f, u_f, s_x, g_x, h_x))
    assert float(u_f) == 0.0, f"unresolved = {u_f}"
    np.testing.assert_allclose(s_f, s_x, rtol=2e-4)
    np.testing.assert_allclose(g_f, g_x, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(h_f, h_x, rtol=2e-3, atol=1e-3)
    print(f"derivatives: fused == two_level (score {float(s_f):.5f})", file=sys.stderr)

    r_f = ndt_align(m, src, T0, cfg)
    r_x = ndt_align(m, src, T0, cfg_x)
    p_f, p_x, u = jax.device_get((r_f.pose, r_x.pose, r_f.unresolved))
    assert float(u) == 0.0
    np.testing.assert_allclose(p_f, p_x, atol=5e-3)
    print("align: fused == two_level", file=sys.stderr)

    # fused KNN kernel (A-LOAM backend) vs brute-force NN, compiled
    from lidar_slam_tpu.ops.hashgrid import build_bucket_grid
    from lidar_slam_tpu.ops.pallas.knn_fused import window_knn

    tgt = pts[:2048]
    qry = pts[:256] + np.float32([0.05, 0.02, 0.0])
    grid = build_bucket_grid(jnp.asarray(tgt), jnp.ones(len(tgt), bool), cell_size=1.0)
    out = window_knn(
        grid, jnp.asarray(qry), jnp.ones(len(qry), bool), k=5, max_radius=1.0
    )
    out = jax.device_get(out)
    assert float(out["unresolved"]) == 0.0
    d2 = np.sum((qry[:, None, :] - tgt[None, :, :]) ** 2, axis=-1)
    brute = np.sort(d2, axis=1)[:, :5]
    got = np.where(out["ok"], out["dist"] ** 2, np.inf)
    want = np.where(brute <= 1.0, brute, np.inf)
    ok_rows = np.isfinite(want).all(axis=1)
    np.testing.assert_allclose(got[ok_rows], want[ok_rows], rtol=1e-3, atol=1e-5)
    print("knn_fused: compiled kernel == brute force", file=sys.stderr)

    print("TPU_KERNEL_CHECK_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-3 experiment 5: per-stage breakdown of the 36.7 ms/frame step.

Times each stage compiled standalone: preprocess (mask+downsample 131k->32k),
sort_points_by_vid, one fused derivative eval, one full align (max_iter 30,
warm guess), and the composite step.
"""
import sys
import time

import numpy as np


def _leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def timeit(fn, *args, reps=20):
    """block_until_ready is a NO-OP on the axon backend — device_get of one
    leaf is the only reliable fence. One round trip amortized over reps."""
    import jax

    jax.device_get(_leaf(fn(*args)))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(_leaf(out))
    return (time.time() - t0) / reps * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
    from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align, ndt_derivatives
    from lidar_slam_tpu.models.registration.ndt import sort_points_by_vid
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    print(f"devices: {jax.devices()}", file=sys.stderr)
    RAW, FC = 131072, 32768
    world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
    traj = make_trajectory(40, speed=2.0)
    kf = []
    for i in range(0, 40, 2):
        pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=RAW, seed=i, noise=0.015)
        kf.append((pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3])[:16384])
    mc = voxel_downsample(PointCloud.from_points(np.concatenate(kf).astype(np.float32)), 0.3,
                          out_capacity=20 * 16384)
    cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=30,
                    stencil="direct7", gather="fused", max_compact_voxels=65536)
    m = build_ndt_map(mc, cfg)
    jax.block_until_ready(m.icov)

    pts, mask, _ = simulate_scan(world, traj[10], max_range=80.0, n_points=RAW, seed=1000, noise=0.02)
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)
    guess = jnp.asarray(traj[10], jnp.float32)  # warm (exact) guess

    @jax.jit
    def pre(points, mask):
        mm = mask & finite_mask(points)
        cloud = PointCloud(points=jnp.where(mm[:, None], points, 0.0), mask=mm)
        return voxel_downsample(cloud, 0.5, out_capacity=FC)

    frame = pre(pts, mask)
    jax.block_until_ready(frame.points)

    @jax.jit
    def sortv(m_arg, f, g):
        return sort_points_by_vid(m_arg, f.points, f.mask, f.get_weights(), g)

    sp, sm, sw = sortv(m, frame, guess)
    jax.block_until_ready(sp)

    pose6 = jnp.zeros(6).at[:3].set(guess[:3, 3])

    @jax.jit
    def one_eval(m_arg, p, k, w, q):
        return ndt_derivatives(m_arg, p, k, q, cfg, True, weights=w, return_unresolved=True)

    @jax.jit
    def align(m_arg, f, g):
        r = ndt_align(m_arg, f, g, cfg)
        return r.pose, r.iterations

    @jax.jit
    def composite(m_arg, points, mask, g):
        f = pre.__wrapped__(points, mask)
        r = ndt_align(m_arg, f, g, cfg)
        return r.pose, r.iterations

    print(f"preprocess (131k->32k downsample): {timeit(pre, pts, mask):7.2f} ms")
    print(f"sort_points_by_vid (32k):          {timeit(sortv, m, frame, guess):7.2f} ms")
    print(f"one fused derivative eval:         {timeit(one_eval, m, sp, sm, sw, pose6):7.2f} ms")
    t_align = timeit(align, m, frame, guess)
    r = align(m, frame, guess)
    print(f"full align (warm guess):           {t_align:7.2f} ms ({int(r[1])} iters)")
    t_comp = timeit(composite, m, pts, mask, guess)
    print(f"composite step:                    {t_comp:7.2f} ms")
    # also: how much does a COLD guess (0.3 m off) cost end to end?
    bad = np.asarray(traj[10]).copy()
    bad[:3, 3] += [0.25, -0.2, 0.1]
    t_cold = timeit(composite, m, pts, mask, jnp.asarray(bad, jnp.float32))
    rc = composite(m, pts, mask, jnp.asarray(bad, jnp.float32))
    print(f"composite step (cold guess):       {t_cold:7.2f} ms ({int(rc[1])} iters)")


if __name__ == "__main__":
    main()

"""Round-3 experiment: newton vs lm solver, direct7 vs radius27 on the real TPU.

Usage: python scratch/r3_solver_bench.py [n_frames]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
    from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    raw_capacity = 131072
    frame_capacity = 32768

    world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
    traj = make_trajectory(40, speed=2.0)
    kf_pts = []
    for i in range(0, 40, 2):
        pts, mask, _ = simulate_scan(
            world, traj[i], max_range=80.0, n_points=raw_capacity, seed=i, noise=0.015
        )
        w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
        kf_pts.append(w[:16384])
    local_map = np.concatenate(kf_pts).astype(np.float32)
    map_cloud = PointCloud.from_points(local_map)
    t0 = time.time()
    map_cloud = voxel_downsample(map_cloud, 0.3, out_capacity=map_cloud.capacity)
    print(f"downsample: {time.time()-t0:.2f}s", file=sys.stderr)

    frames = []
    rng = np.random.default_rng(7)
    for i in range(n_frames):
        fi = 10 + (i % 20)
        pts, mask, _ = simulate_scan(
            world, traj[fi], max_range=80.0, n_points=raw_capacity, seed=1000 + i, noise=0.02
        )
        guess = traj[fi].copy()
        guess[:3, 3] += rng.normal(0, 0.3, 3)
        a = rng.normal(0, np.deg2rad(1.0))
        c, s = np.cos(a), np.sin(a)
        guess[:3, :3] = guess[:3, :3] @ np.array(
            [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32
        )
        frames.append((jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(guess, jnp.float32)))

    gather = os.environ.get("NDT_GATHER", "fused")
    combos = [
        ("newton", "direct7"),
        ("lm", "direct7"),
        ("lm", "radius27"),
        ("newton", "radius27"),
    ]
    maps = {}
    for solver, stencil in combos:
        cfg = NDTConfig(
            resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=30,
            stencil=stencil, gather=gather, max_compact_voxels=65536, solver=solver,
        )
        if stencil not in maps:
            t0 = time.time()
            m = build_ndt_map(map_cloud, cfg)
            jax.block_until_ready(m.icov)
            print(f"map build ({stencil}): {time.time()-t0:.2f}s", file=sys.stderr)
            maps[stencil] = m
        ndt_map = maps[stencil]

        @jax.jit
        def step(m_arg, points, mask, guess):
            m = mask & finite_mask(points)
            cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
            frame = voxel_downsample(cloud, 0.5, out_capacity=frame_capacity)
            r = ndt_align(m_arg, frame, guess, cfg)
            return r.pose, r.iterations, r.unresolved, r.converged

        t0 = time.time()
        pose, it, unres, conv = step(ndt_map, *frames[0])
        jax.block_until_ready(pose)
        print(f"  compile: {time.time()-t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        outs = []
        for pts, mask, guess in frames:
            outs.append(step(ndt_map, pts, mask, guess))
        jax.block_until_ready(outs[-1][0])
        dt = time.time() - t0
        errs = [
            float(np.linalg.norm(np.asarray(o[0])[:3, 3] - traj[10 + (i % 20)][:3, 3]))
            for i, o in enumerate(outs)
        ]
        iters = [int(o[1]) for o in outs]
        unresolved = max(float(o[2]) for o in outs)
        nconv = sum(bool(o[3]) for o in outs)
        print(
            f"{solver:7s} {stencil:9s}: {n_frames/dt:7.2f} fps, {dt/n_frames*1000:6.1f} ms/f, "
            f"iters mean {np.mean(iters):5.1f}, err mean {np.mean(errs):.4f} max {np.max(errs):.4f}, "
            f"unresolved {unresolved}, converged {nconv}/{n_frames}"
        )


if __name__ == "__main__":
    main()

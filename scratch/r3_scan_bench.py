"""Round-3 experiment 4: scan-chained sequential benchmark (production
semantics — pose_i feeds the motion-model guess for frame i+1 inside ONE
device program) with a max_iter sweep. Run on the real TPU."""
import dataclasses
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
    n_frames = 20
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
    map_cloud = voxel_downsample(map_cloud, 0.3, out_capacity=map_cloud.capacity)

    # consecutive frames 10..29 (one revisit sweep along the corridor)
    all_pts = np.zeros((n_frames, raw_capacity, 3), np.float32)
    all_msk = np.zeros((n_frames, raw_capacity), bool)
    for i in range(n_frames):
        pts, mask, _ = simulate_scan(
            world, traj[10 + i], max_range=80.0, n_points=raw_capacity,
            seed=1000 + i, noise=0.02,
        )
        all_pts[i] = pts
        all_msk[i] = mask
    gt = traj[10:10 + n_frames]

    base = NDTConfig(
        resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=30,
        stencil="direct7", gather="fused", max_compact_voxels=65536,
    )
    ndt_map = build_ndt_map(map_cloud, base)
    jax.block_until_ready(ndt_map.icov)

    rng = np.random.default_rng(7)
    guess0 = gt[0].copy()
    guess0[:3, 3] += rng.normal(0, 0.3, 3)

    for max_iter in (8, 12, 20, 30):
        cfg = dataclasses.replace(base, max_iter=max_iter)

        @jax.jit
        def drive(m_arg, pts_seq, msk_seq, guess_init):
            def one(carry, inp):
                last_pose, predict = carry
                points, mask = inp
                m = mask & finite_mask(points)
                cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
                frame = voxel_downsample(cloud, 0.5, out_capacity=frame_capacity)
                r = ndt_align(m_arg, frame, predict, cfg)
                # motion-model prediction (front_end.cpp:238-240)
                step = jnp.linalg.solve(last_pose, r.pose)
                return (r.pose, r.pose @ step), (r.pose, r.iterations, r.unresolved)

            (_, _), outs = jax.lax.scan(one, (guess_init, guess_init), (pts_seq, msk_seq))
            return outs

        t0 = time.time()
        out = drive(ndt_map, jnp.asarray(all_pts), jnp.asarray(all_msk), jnp.asarray(guess0))
        jax.block_until_ready(out[0])
        compile_s = time.time() - t0

        t0 = time.time()
        poses, iters, unres = jax.device_get(
            drive(ndt_map, jnp.asarray(all_pts), jnp.asarray(all_msk), jnp.asarray(guess0))
        )
        dt = time.time() - t0
        errs = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
        print(
            f"max_iter {max_iter:2d}: {n_frames/dt:7.2f} fps, {dt/n_frames*1000:6.1f} ms/f, "
            f"iters mean {np.mean(iters):5.1f} max {int(max(iters))}, "
            f"err mean {errs.mean():.4f} max {errs.max():.4f}, "
            f"unresolved {float(unres.max())}, compile {compile_s:.0f}s"
        )


if __name__ == "__main__":
    main()

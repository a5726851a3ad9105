"""Round-3 experiment 2: Newton step_size sweep with honest sequential timing
(pose fed forward frame-to-frame, per-frame block), plus a score_rel_tol
compile probe. Run on the real TPU."""
import os
import sys
import time

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
    from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n_frames = 10
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

    base = NDTConfig(
        resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=30,
        stencil="direct7", gather="fused", max_compact_voxels=65536,
    )
    t0 = time.time()
    ndt_map = build_ndt_map(map_cloud, base)
    jax.block_until_ready(ndt_map.icov)
    t1 = time.time()
    ndt_map2 = build_ndt_map(map_cloud, base)
    jax.block_until_ready(ndt_map2.icov)
    print(f"map build: first {t1-t0:.2f}s (compile+run), second {time.time()-t1:.2f}s (run)",
          file=sys.stderr)

    for step_size in (0.1, 0.3, 0.5, 1.0):
        cfg = dataclasses.replace(base, step_size=step_size)

        @jax.jit
        def step(m_arg, points, mask, guess):
            m = mask & finite_mask(points)
            cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
            frame = voxel_downsample(cloud, 0.5, out_capacity=frame_capacity)
            r = ndt_align(m_arg, frame, guess, cfg)
            return r.pose, r.iterations, r.unresolved

        t0 = time.time()
        out = step(ndt_map, *frames[0])
        jax.block_until_ready(out[0])
        print(f"  compile: {time.time()-t0:.1f}s", file=sys.stderr)

        # honest sequential timing: block per frame (production feeds pose_i
        # into guess_{i+1}, so frames cannot overlap)
        t0 = time.time()
        outs = []
        for pts, mask, guess in frames:
            pose, it, unres = step(ndt_map, pts, mask, guess)
            pose, it, unres = jax.device_get((pose, it, unres))
            outs.append((pose, it, unres))
        dt = time.time() - t0
        errs = [
            float(np.linalg.norm(o[0][:3, 3] - traj[10 + (i % 20)][:3, 3]))
            for i, o in enumerate(outs)
        ]
        iters = [int(o[1]) for o in outs]
        unres = max(float(o[2]) for o in outs)
        print(
            f"step_size {step_size:4.1f}: {n_frames/dt:7.2f} fps, {dt/n_frames*1000:6.1f} ms/f, "
            f"iters mean {np.mean(iters):5.1f} max {max(iters)}, "
            f"err mean {np.mean(errs):.4f} max {np.max(errs):.4f}, unresolved {unres}"
        )

    # score_rel_tol compile probe (documented XLA hang, ndt.py:123-131):
    # guarded by an alarm so a hang doesn't eat the session
    if os.environ.get("PROBE_RELTOL", "0") == "1":
        import signal

        def on_alarm(sig, frm):
            raise TimeoutError("score_rel_tol compile exceeded 300s — still hangs")

        signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(300)
        try:
            cfg = dataclasses.replace(base, score_rel_tol=1e-3)
            r = ndt_align(ndt_map, voxel_downsample(
                PointCloud(points=frames[0][0], mask=frames[0][1]), 0.5,
                out_capacity=frame_capacity), frames[0][2], cfg)
            jax.block_until_ready(r.pose)
            signal.alarm(0)
            print(f"score_rel_tol=1e-3 COMPILED AND RAN: iters {int(r.iterations)}")
        except TimeoutError as e:
            print(f"score_rel_tol probe: {e}")


if __name__ == "__main__":
    main()

"""Benchmark: weighted-NDT scan-to-map registration throughput on one chip.

Prints ONE JSON line:
  {"metric": "ndt_scan_match_fps", "value": N, "unit": "frames/s", "vs_baseline": R}

The workload mirrors the reference front end's hot path at KITTI HDL-64
scale (config/mapping/front_end.yaml operating point): a ~20-keyframe local
map (voxel-Gaussian NDT target, res 1.0 m) and per-frame [131072]-padded
raw scans voxel-filtered to <=32768 points, aligned with the manual-NDT
Newton iteration.

Baseline: the reference publishes no numbers (BASELINE.md); its implicit
real-time budget is the 10 Hz sweep rate (scanRegistration.cpp:61,
front_end_node.cpp:27 — 100 Hz poll, 10 Hz data). vs_baseline = fps / 10,
i.e. multiples of reference real-time. The driver-defined >=5x-CPU-fps
target is tracked separately once a reference CPU measurement exists.
"""

import json
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

    import os

    # default operating point: direct7 neighbourhood (pclomp-style; the
    # reference-exact gated radius27 stays available via NDT_STENCIL) with
    # the fused Pallas kernel (NDT_GATHER=two_level for the XLA path).
    stencil = os.environ.get("NDT_STENCIL", "direct7")
    gather = os.environ.get("NDT_GATHER", "fused")
    # the fused kernel's cost is window-bound, not capacity-bound: 65536
    # measured within 10% of 8192, and a denser scene must not silently
    # truncate valid voxels (build_ndt_map caps at max_compact_voxels)
    max_compact = int(os.environ.get("NDT_MAX_COMPACT", "65536"))
    max_iter = int(os.environ.get("NDT_MAX_ITER", "30"))
    cfg = NDTConfig(
        resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=max_iter,
        stencil=stencil, gather=gather, max_compact_voxels=max_compact,
    )
    n_frames = 20
    raw_capacity = 131072
    frame_capacity = 32768

    # --- build a KITTI-scale local map: 20 keyframes x ~16k pts, 0.3 m leaf
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
    ndt_map = build_ndt_map(map_cloud, cfg)
    jax.block_until_ready(ndt_map.icov)
    print(
        f"map build: {time.time()-t0:.2f}s, {int(map_cloud.num_valid())} pts, "
        f"{int(ndt_map.valid.sum())} valid voxels",
        file=sys.stderr,
    )

    # --- per-frame pipeline fused into ONE dispatch: mask -> voxel filter
    # -> align (multiple small dispatches through the device tunnel dominate
    # wall time otherwise)
    @jax.jit
    def step(m_arg, points, mask, guess):
        # the map must be an ARGUMENT: closing over it bakes hundreds of MB
        # of voxel stats into the HLO as constants
        m = mask & finite_mask(points)
        cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
        frame = voxel_downsample(cloud, 0.5, out_capacity=frame_capacity)
        r = ndt_align(m_arg, frame, guess, cfg)
        return r.pose, r.iterations

    frames = []
    rng = np.random.default_rng(7)
    for i in range(n_frames):
        fi = 10 + (i % 20)
        pts, mask, _ = simulate_scan(
            world, traj[fi], max_range=80.0, n_points=raw_capacity, seed=1000 + i, noise=0.02
        )
        # realistic init: constant-velocity prediction error (~0.3 m, ~1 deg)
        guess = traj[fi].copy()
        guess[:3, 3] += rng.normal(0, 0.3, 3)
        a = rng.normal(0, np.deg2rad(1.0))
        c, s = np.cos(a), np.sin(a)
        guess[:3, :3] = guess[:3, :3] @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        frames.append((jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(guess, jnp.float32)))

    # warmup / compile
    pose, it = step(ndt_map, *frames[0])
    jax.block_until_ready(pose)

    t0 = time.time()
    iters = []
    poses = []
    for pts, mask, guess in frames:
        pose, it = step(ndt_map, pts, mask, guess)
        iters.append(it)
        poses.append(pose)
    jax.block_until_ready(pose)
    dt = time.time() - t0
    fps = n_frames / dt
    # quality guard: the speed number is only meaningful if poses converge
    errs = [
        float(np.linalg.norm(np.asarray(p)[:3, 3] - traj[10 + (i % 20)][:3, 3]))
        for i, p in enumerate(poses)
    ]
    print(
        f"pose error vs ground truth: mean {np.mean(errs):.3f} m, max {np.max(errs):.3f} m",
        file=sys.stderr,
    )
    print(
        f"scan match: {dt/n_frames*1000:.1f} ms/frame, mean Newton iters "
        f"{np.mean([int(i) for i in iters]):.1f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "ndt_scan_match_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

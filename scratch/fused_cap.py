import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import ndt_derivatives
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
mc = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)

pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
frame = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
frame = voxel_downsample(frame, 0.5, out_capacity=32768)
pose6 = jnp.asarray([0.1, 0.05, 0.0, 0.01, 0.0, 0.02], jnp.float32)

for cap in (8192, 65536):
    cfg = NDTConfig(resolution=1.0, grid_dims=(256,256,64), stencil="direct7",
                    gather="fused", max_compact_voxels=cap)
    m = build_ndt_map(mc, cfg)
    f = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, cfg, True))
    s, g, h = f(m, frame.points, frame.mask, pose6)
    print(f"cap={cap}: score {float(s):.4f} ms/eval {timeit(f, m, frame.points, frame.mask, pose6):.2f}")

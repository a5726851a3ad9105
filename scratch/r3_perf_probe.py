import time, sys
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

print("devices:", jax.devices(), file=sys.stderr)

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
cfgN = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, stencil="direct7", max_iter=30, gather="fused")
cfgL = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, stencil="direct7", max_iter=30, solver="lm", gather="fused")

t0 = time.perf_counter()
mcd = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
jax.block_until_ready(mcd.points)
t1 = time.perf_counter()
print(f"downsample (compile+exec): {t1-t0:.2f}s", file=sys.stderr)

build_j = jax.jit(lambda c: build_ndt_map(c, cfgN))
t0 = time.perf_counter()
ndt_map = build_j(mcd)
jax.block_until_ready(ndt_map.icov)
t1 = time.perf_counter()
print(f"map build 1st (compile+exec): {t1-t0:.2f}s", file=sys.stderr)
# second call, same shapes -> cached compile
t0 = time.perf_counter()
ndt_map2 = build_j(mcd)
jax.block_until_ready(ndt_map2.icov)
t1 = time.perf_counter()
print(f"map build exec: {(t1-t0)*1e3:.1f} ms", file=sys.stderr)

rng = np.random.default_rng(7)
frames = []
for k in range(8):
    i = 5 + 4 * k % 35
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=100 + k, noise=0.015)
    fr = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
    fr = voxel_downsample(fr, 0.5, out_capacity=32768)
    dt = rng.uniform(-0.8, 0.8, 3); dt[2] *= 0.1
    dyaw = rng.uniform(-0.06, 0.06)
    R = np.array([[np.cos(dyaw), -np.sin(dyaw), 0], [np.sin(dyaw), np.cos(dyaw), 0], [0, 0, 1]], np.float32)
    guess = traj[i].copy(); guess[:3, :3] = guess[:3, :3] @ R; guess[:3, 3] += dt
    frames.append((fr, guess.astype(np.float32), traj[i]))

for name, cfg in (("newton", cfgN), ("lm", cfgL)):
    f = jax.jit(lambda m, s, g: ndt_align(m, s, g, cfg))
    t0 = time.perf_counter()
    r = f(ndt_map, frames[0][0], frames[0][1]); jax.block_until_ready(r.pose)
    print(f"{name} align compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    errs, iters, times = [], [], []
    for fr, guess, gt in frames:
        t0 = time.perf_counter()
        r = f(ndt_map, fr, guess); jax.block_until_ready(r.pose)
        times.append(time.perf_counter() - t0)
        P = np.asarray(r.pose)
        errs.append(np.linalg.norm(P[:3, 3] - gt[:3, 3]))
        iters.append(int(r.iterations))
    print(f"{name}: err mean {np.mean(errs)*100:.1f} cm max {np.max(errs)*100:.1f} cm | "
          f"iters {iters} | ms/frame {np.mean(times)*1e3:.1f} | unresolved {float(r.unresolved)}")

import time, sys, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
base = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, stencil="direct7", max_iter=30, gather="fused")
mcd = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
ndt_map = build_ndt_map(mcd, base)
jax.block_until_ready(ndt_map.packed)
print("map ready", file=sys.stderr)

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


def run(name, cfg):
    f = jax.jit(lambda m, s, g: ndt_align(m, s, g, cfg))
    r = f(ndt_map, frames[0][0], frames[0][1]); jax.block_until_ready(r.pose)
    times, iters, errs = [], [], []
    for fr, guess, gt in frames:
        t0 = time.perf_counter()
        r = f(ndt_map, fr, guess); jax.block_until_ready(r.pose)
        times.append(time.perf_counter() - t0)
        iters.append(int(r.iterations))
        errs.append(np.linalg.norm(np.asarray(r.pose)[:3, 3] - gt[:3, 3]))
    print(f"{name}: iters mean {np.mean(iters):.1f} | ms {np.mean(times)*1e3:.1f} | err {np.mean(errs)*100:.1f} cm")
    return np.mean(times) * 1e3, np.mean(iters)

m2, i2 = run("max_iter=2", dataclasses.replace(base, max_iter=2))
m30, i30 = run("max_iter=30", base)
per_iter = (m30 - m2) / max(i30 - i2, 1)
print(f"-> per-iter {per_iter:.2f} ms, fixed {m2 - i2*per_iter:.1f} ms")

for tile in (512, 1024):
    run(f"tile={tile}", dataclasses.replace(base, fused_tile=tile))
for window in (1024, 512):
    run(f"window={window}", dataclasses.replace(base, fused_window=window))
run("two_level", dataclasses.replace(base, gather="two_level"))
run("chunk32k two_level", dataclasses.replace(base, gather="two_level", point_chunk=32768))

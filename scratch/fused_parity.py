import time, sys, dataclasses
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

for stencil in ("direct7", "radius27"):
    ref_cfg = NDTConfig(resolution=1.0, grid_dims=(256,256,64), point_chunk=8192,
                        stencil=stencil, gather="two_level", max_compact_voxels=8192)
    fus_cfg = dataclasses.replace(ref_cfg, gather="fused")
    ndt_map = build_ndt_map(mc, ref_cfg)
    jax.block_until_ready(ndt_map.icov)

    pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
    frame = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
    frame = voxel_downsample(frame, 0.5, out_capacity=32768)
    pose6 = jnp.asarray([0.1, 0.05, 0.0, 0.01, 0.0, 0.02], jnp.float32)

    f_ref = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, ref_cfg, True))
    f_fus = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, fus_cfg, True))
    s0, g0, h0 = [np.asarray(x) for x in f_ref(ndt_map, frame.points, frame.mask, pose6)]
    s1, g1, h1 = [np.asarray(x) for x in f_fus(ndt_map, frame.points, frame.mask, pose6)]
    print(f"[{stencil}] score ref {s0:.4f} fused {s1:.4f} rel {abs(s1-s0)/abs(s0):.2e}")
    print(f"  grad rel err {np.max(np.abs(g1-g0))/max(np.max(np.abs(g0)),1e-9):.2e}")
    print(f"  hess rel err {np.max(np.abs(h1-h0))/max(np.max(np.abs(h0)),1e-9):.2e}")
    print(f"  ms/eval ref {timeit(f_ref, ndt_map, frame.points, frame.mask, pose6):.2f} "
          f"fused {timeit(f_fus, ndt_map, frame.points, frame.mask, pose6):.2f}")

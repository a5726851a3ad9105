import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import ndt_derivatives, _ndt_derivatives_fused
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

def timeit(fn, *args, n=30, warmup=3):
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
base = NDTConfig(resolution=1.0, grid_dims=(256,256,64), stencil="direct7",
                 gather="fused", max_compact_voxels=8192)
m = build_ndt_map(mc, base)

pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
frame = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
frame = voxel_downsample(frame, 0.5, out_capacity=32768)
# sort like ndt_align does
from lidar_slam_tpu.models.registration.ndt import _flat_vid
cell0 = jnp.clip(jnp.floor((frame.points - m.origin)/1.0).astype(jnp.int32), 0, jnp.asarray(base.grid_dims)-1)
vid0 = jnp.where(frame.mask, _flat_vid(cell0, base.grid_dims), 2**30)
o = jnp.argsort(vid0)
P, M = frame.points[o], frame.mask[o]
pose6 = jnp.asarray([0.1, 0.05, 0.0, 0.01, 0.0, 0.02], jnp.float32)

for tile in (256, 512, 1024):
    for window in (1024, 2048):
        cfg = dataclasses.replace(base, fused_tile=tile, fused_window=window)
        f = jax.jit(lambda mm, p, mk, ps: _ndt_derivatives_fused(mm, p, mk, ps, cfg, None, True))
        s, g, h, u = f(m, P, M, pose6)
        print(f"tile={tile} window={window}: unresolved={float(u):.0f} score={float(s):.3f} ms={timeit(f, m, P, M, pose6):.2f}")

"""Microbench: where does the NDT derivative eval spend time on TPU?"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import ndt_derivatives, _flat_vid, _stencil7
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms

cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                stencil="direct7", gather="two_level")
world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
local_map = np.concatenate(kf).astype(np.float32)
mc = PointCloud.from_points(local_map)
mc = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
ndt_map = build_ndt_map(mc, cfg)
jax.block_until_ready(ndt_map.icov)
print("valid voxels:", int(ndt_map.valid.sum()), "capacity:", ndt_map.packed.shape, file=sys.stderr)

pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
frame = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
frame = voxel_downsample(frame, 0.5, out_capacity=32768)
pose6 = jnp.asarray([0.1, 0.05, 0.0, 0.0, 0.0, 0.02], jnp.float32)
P = np.asarray(frame.points); M = np.asarray(frame.mask)
print("frame pts:", int(M.sum()), file=sys.stderr)

# 1) full eval
f_full = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, cfg, True))
f_nohess = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, cfg, False))
print("full eval ms:", timeit(f_full, ndt_map, frame.points, frame.mask, pose6))
print("score+grad eval ms:", timeit(f_nohess, ndt_map, frame.points, frame.mask, pose6))

# 2) pieces: index gather / packed gather / both / compute-only
dims = cfg.grid_dims
stencil = jnp.asarray(_stencil7())
def mk_vid(p, ps):
    from lidar_slam_tpu.geom.se3 import euler_xyz_to_matrix
    R = euler_xyz_to_matrix(ps[3], ps[4], ps[5])
    xp = p @ R.T + ps[:3]
    cell = jnp.floor((xp - ndt_map.origin) / 1.0).astype(jnp.int32)
    cand = cell[:, None, :] + stencil[None, :, :]
    inb = jnp.all((cand >= 0) & (cand < jnp.asarray(dims, jnp.int32)), axis=-1)
    return jnp.where(inb, _flat_vid(cand, dims), 0)

vid = jax.jit(mk_vid)(frame.points, pose6)
jax.block_until_ready(vid)

f_ig = jax.jit(lambda v: ndt_map.index[v])
ci = f_ig(vid); jax.block_until_ready(ci)
print("index gather [32768,7] from 4.2M grid ms:", timeit(f_ig, vid))
f_pg = jax.jit(lambda c: ndt_map.packed[c])
print("packed gather [32768,7,16] from 64Kx16 ms:", timeit(f_pg, ci))
f_both = jax.jit(lambda v: ndt_map.packed[ndt_map.index[v]])
print("both gathers ms:", timeit(f_both, vid))
# gather straight from a dense packed table? too big to build (4.2M x 16 = 268MB) - skip

# 3) chunk sweep
for chunk in (8192, 16384, 32768):
    c2 = NDTConfig(resolution=1.0, grid_dims=dims, point_chunk=chunk, stencil="direct7")
    g = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, c2, True))
    print(f"full eval chunk={chunk} ms:", timeit(g, ndt_map, frame.points, frame.mask, pose6))

# 4) radius27 for scale
c27 = NDTConfig(resolution=1.0, grid_dims=dims, point_chunk=8192, stencil="radius27")
g27 = jax.jit(lambda m, p, mk, ps: ndt_derivatives(m, p, mk, ps, c27, True))
print("full eval radius27 ms:", timeit(g27, ndt_map, frame.points, frame.mask, pose6))

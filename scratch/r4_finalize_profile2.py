"""Bisect finalize stages; scalar-only fetches (tunnel-safe)."""
import time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, empty_ndt_sums, scatter_to_sums, finalize_ndt_sums, recenter_ndt_sums
from lidar_slam_tpu.ops.pointcloud import PointCloud, voxel_downsample

cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                max_iter=30, stencil="direct7", gather="auto",
                max_compact_voxels=65536, dense_stats=False)
world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=0.8)
pts, mask, _ = simulate_scan(world, traj[5], max_range=80.0, n_points=131072, seed=1, noise=0.02)
frame = voxel_downsample(PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask)), 0.5, out_capacity=16384)
origin = jnp.floor((traj[5][:3, 3] - 0.5 * jnp.asarray([256., 256., 64.])) / 1.0) * 1.0
sums = empty_ndt_sums(origin, cfg)
sums = jax.jit(scatter_to_sums)(sums, frame.points, frame.mask, jnp.ones(16384, jnp.float32))
jax.device_get(sums.count.sum())
dims = cfg.grid_dims
v = dims[0]*dims[1]*dims[2]
cap = cfg.max_compact_voxels

def timeit(name, fn, *args, reps=20):
    r = fn(*args); jax.device_get(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.device_get(r)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms")

@jax.jit
def s_cleanup(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(c < 0.5, 0.0, c).sum()

@jax.jit
def s_cumsum(c):
    occ = c >= 1.0
    return (jnp.cumsum(occ.astype(jnp.int32)) - 1)[-1]

@jax.jit
def s_scatter(c):
    occ = c >= 1.0
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    in_cap = occ & (pos < cap)
    st = jnp.where(in_cap, pos, cap)
    idx = jnp.arange(v, dtype=jnp.int32)
    keys = jnp.full((cap+1,), -1, jnp.int32).at[st].set(jnp.where(in_cap, idx, -1), mode="drop")
    return keys.sum()

@jax.jit
def s_gather(c, psum, ppsum, wsum, keys):
    chas = keys >= 0
    cvid = jnp.maximum(keys, 0)
    return (jnp.where(chas, c[cvid], 0.).sum() + psum[cvid].sum() + ppsum[cvid].sum() + wsum[cvid].sum())

@jax.jit
def s_finalize(s):
    m = finalize_ndt_sums(s, cfg)
    return m.packed.sum() + m.keys.sum()

@jax.jit
def s_recenter(s, o):
    return recenter_ndt_sums(s, o).count.sum()

@jax.jit
def s_scatterp(s, p, m, w):
    return scatter_to_sums(s, p, m, w).count.sum()

keys = jnp.where(jnp.arange(cap+1) < 108, jnp.arange(cap+1)*38000 % v, -1).astype(jnp.int32)
timeit("cleanup", s_cleanup, sums.count)
timeit("cumsum", s_cumsum, sums.count)
timeit("cumsum+keys scatter", s_scatter, sums.count)
timeit("compact gathers", s_gather, sums.count, sums.psum, sums.ppsum, sums.wsum, keys)
timeit("finalize full", s_finalize, sums)
timeit("recenter", s_recenter, sums, origin + 2.0)
timeit("scatter 16k pts", s_scatterp, sums, frame.points, frame.mask, jnp.ones(16384, jnp.float32))

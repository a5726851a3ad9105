"""Bisect finalize_ndt_sums (dense_stats=False) stage costs on TPU."""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, empty_ndt_sums, scatter_to_sums
from lidar_slam_tpu.models.registration.ndt import _condition_rows
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
v = dims[0] * dims[1] * dims[2]
cap = cfg.max_compact_voxels

def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms")
    return out

@jax.jit
def stage_cleanup(count_raw):
    count = jnp.maximum(count_raw, 0.0)
    return jnp.where(count < 0.5, 0.0, count)

count = timeit("cleanup [V]", stage_cleanup, sums.count)

@jax.jit
def stage_cumsum(count):
    occupied = count >= float(cfg.min_points_per_voxel)
    pos = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    return occupied, pos

occupied, pos = timeit("occupied+cumsum [V]", stage_cumsum, count)

@jax.jit
def stage_scatter(occupied, pos):
    idx = jnp.arange(v, dtype=jnp.int32)
    in_cap = occupied & (pos < cap)
    index = jnp.where(in_cap, pos, cap).astype(jnp.int32)
    scatter_to = jnp.where(in_cap, pos, cap)
    keys = jnp.full((cap + 1,), -1, jnp.int32).at[scatter_to].set(
        jnp.where(in_cap, idx, -1), mode="drop")
    return index, keys.at[cap].set(-1)

index, keys = timeit("index+keys scatter [V->cap]", stage_scatter, occupied, pos)

@jax.jit
def stage_gather(keys, count, psum, ppsum, wsum):
    chas = keys >= 0
    cvid = jnp.maximum(keys, 0)
    c_count = jnp.where(chas, count[cvid], 0.0)
    return c_count, psum[cvid], ppsum[cvid], wsum[cvid]

g = timeit("compact gathers [cap rows]", stage_gather, keys, count, sums.psum, sums.ppsum, sums.wsum)

@jax.jit
def stage_condition(keys, c_count, c_psum, c_ppsum, c_wsum):
    chas = keys >= 0
    cvid = jnp.maximum(keys, 0)
    c_n = jnp.maximum(c_count, 1.0)
    c_rel = c_psum / c_n[:, None]
    c_pp = c_ppsum / c_n[:, None]
    c_cov = jnp.stack([
        c_pp[:, 0] - c_rel[:, 0] * c_rel[:, 0],
        c_pp[:, 1] - c_rel[:, 0] * c_rel[:, 1],
        c_pp[:, 2] - c_rel[:, 0] * c_rel[:, 2],
        c_pp[:, 1] - c_rel[:, 0] * c_rel[:, 1],
        c_pp[:, 3] - c_rel[:, 1] * c_rel[:, 1],
        c_pp[:, 4] - c_rel[:, 1] * c_rel[:, 2],
        c_pp[:, 2] - c_rel[:, 0] * c_rel[:, 2],
        c_pp[:, 4] - c_rel[:, 1] * c_rel[:, 2],
        c_pp[:, 5] - c_rel[:, 2] * c_rel[:, 2],
    ], axis=-1).reshape(-1, 3, 3)
    c_cov = c_cov * ((c_n - 1.0) / c_n)[:, None, None]
    cz = cvid % dims[2]; cy = (cvid // dims[2]) % dims[1]; cx = cvid // (dims[1]*dims[2])
    origin_cells = jnp.round(origin / 1.0).astype(jnp.int32)
    corner = (origin_cells[None, :] + jnp.stack([cx, cy, cz], axis=-1)).astype(jnp.float32)
    c_mean = jnp.where(chas[:, None], corner + c_rel, 0.0)
    c_sv = jnp.where(chas, c_wsum / c_n, 0.0)
    rows, icov, valid = _condition_rows(c_count, c_mean, c_cov, c_sv, cfg)
    return rows

timeit("condition+eigh [cap rows]", stage_condition, keys, *g)
print("n occupied:", int(np.asarray(occupied.sum())))

"""Profile front-end drive components on the real TPU: where do
69.8 ms/frame and 53.4 ms/keyframe go?"""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import (
    NDTConfig, build_ndt_map, ndt_align, empty_ndt_sums, scatter_to_sums,
    recenter_ndt_sums, finalize_ndt_sums,
)
from lidar_slam_tpu.ops.pointcloud import PointCloud, voxel_downsample
from lidar_slam_tpu.pipeline.front_end import FrontEnd, FrontEndConfig, _incremental_map_update, _preprocess

RAW_CAP = 131072
cfg = FrontEndConfig(
    ndt=NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                  max_iter=30, stencil="direct7", gather="auto", max_compact_voxels=65536),
)
fine_cfg = dataclasses.replace(cfg.ndt, dense_stats=False)
coarse_cfg = dataclasses.replace(
    cfg.ndt, resolution=2.0, grid_dims=(128, 128, 32), dense_stats=False)

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=0.8)
pts, mask, _ = simulate_scan(world, traj[5], max_range=80.0, n_points=RAW_CAP, seed=1, noise=0.02)
ptsj, maskj = jnp.asarray(pts), jnp.asarray(mask)

def timeit(name, fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps * 1000
    print(f"{name}: {dt:.2f} ms")
    return out

# --- preprocess
frame = timeit("preprocess (131k raw -> leaf0.5 -> 32k)", _preprocess, ptsj, maskj, cfg.frame_capacity, cfg.frame_leaf)

# --- keyframe downsample
kf = timeit("kf downsample (32k -> 16k)", jax.jit(lambda f: voxel_downsample(f, cfg.frame_leaf, out_capacity=cfg.keyframe_capacity)), frame)

# --- sums setup at drive shapes
origin_f = jnp.floor((traj[5][:3, 3] - 0.5 * jnp.asarray([256., 256., 64.])) / 1.0) * 1.0
origin_c = jnp.floor((traj[5][:3, 3] - 0.5 * jnp.asarray([256., 256., 64.])) / 2.0) * 2.0
fs = empty_ndt_sums(origin_f, fine_cfg)
cs = empty_ndt_sums(origin_c, coarse_cfg)
world_pts = kf.points
w = jnp.ones(cfg.keyframe_capacity, jnp.float32)
fs = jax.jit(scatter_to_sums)(fs, world_pts, kf.mask, w)
cs = jax.jit(scatter_to_sums)(cs, world_pts, kf.mask, w)
jax.device_get(fs.count.sum())

# --- component timings
timeit("recenter fine (4.2M voxels)", jax.jit(recenter_ndt_sums), fs, origin_f + 2.0)
timeit("recenter coarse (524k)", jax.jit(recenter_ndt_sums), cs, origin_c + 2.0)
timeit("scatter fine (16k pts)", jax.jit(scatter_to_sums), fs, world_pts, kf.mask, w)
timeit("finalize fine", jax.jit(lambda s: finalize_ndt_sums(s, fine_cfg)), fs)
timeit("finalize coarse", jax.jit(lambda s: finalize_ndt_sums(s, coarse_cfg)), cs)

# --- full incremental update (2 grids)
out = timeit("incremental_map_update (fine+coarse)", _incremental_map_update,
       fs, cs, world_pts, kf.mask, w, kf.points, kf.mask, w,
       jnp.asarray(traj[5], jnp.float32), origin_f, origin_c, fine_cfg, coarse_cfg)

# --- aligns
fmap = finalize_ndt_sums(fs, fine_cfg)
cmap = finalize_ndt_sums(cs, coarse_cfg)
jax.device_get(fmap.keys)
guess = jnp.asarray(traj[5], jnp.float32)
timeit("coarse align (max_iter 30)", jax.jit(lambda m, f, g: ndt_align(m, f, g, coarse_cfg).pose), cmap, frame, guess)
timeit("fine align (max_iter 30)", jax.jit(lambda m, f, g: ndt_align(m, f, g, fine_cfg).pose), fmap, frame, guess)

import time
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.pipeline.aloam.mapping import mapping_step, map_update, AloamMappingConfig
from lidar_slam_tpu.ops.hashgrid import build_bucket_grid, knn_query
from lidar_slam_tpu.ops import PointCloud

def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n * 1e3

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(10, speed=1.5)
fc = FeatureExtractionConfig()
pts, mask, _ = simulate_scan(world, traj[0], max_range=80.0, n_points=131072, seed=0, noise=0.01)
f0 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)
pts, mask, _ = simulate_scan(world, traj[1], max_range=80.0, n_points=131072, seed=1, noise=0.01)
f1 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)
cfg = AloamMappingConfig()

corner_map = PointCloud(points=jnp.zeros((cfg.corner_map_capacity,3), jnp.float32), mask=jnp.zeros(cfg.corner_map_capacity, bool))
surf_map = PointCloud(points=jnp.zeros((cfg.surf_map_capacity,3), jnp.float32), mask=jnp.zeros(cfg.surf_map_capacity, bool))
T0 = jnp.eye(4)
corner_map, surf_map = map_update(corner_map, surf_map, f0.less_sharp, f0.less_flat, T0, cfg)
jax.block_until_ready(corner_map.points)
print("n corner map:", int(corner_map.num_valid()), "n surf map:", int(surf_map.num_valid()))
print("n cur corner:", int(f1.less_sharp.num_valid()), "n cur surf:", int(f1.less_flat.num_valid()))

print("mapping_step ms:", timeit(lambda: mapping_step(corner_map, surf_map, f1.less_sharp, f1.less_flat, T0, cfg)))
print("map_update ms:", timeit(lambda: map_update(corner_map, surf_map, f1.less_sharp, f1.less_flat, T0, cfg)))

grid = build_bucket_grid(surf_map, cfg.grid_cell, cfg.grid_dims)
jax.block_until_ready(grid.points)
print("build grid (surf 131k cap) ms:", timeit(lambda: build_bucket_grid(surf_map, cfg.grid_cell, cfg.grid_dims)))
qs = f1.less_flat.points
f_knn = jax.jit(lambda g, q: knn_query(g, q, k=5, max_radius=1.0, bucket_k=16, chunk=2048))
print("knn surf (32768 q) ms:", timeit(f_knn, grid, qs))
gridc = build_bucket_grid(corner_map, cfg.grid_cell, cfg.grid_dims)
print("knn corner (8192 q) ms:", timeit(f_knn, gridc, f1.less_sharp.points))

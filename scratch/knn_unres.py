import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.ops.hashgrid import build_bucket_grid
from lidar_slam_tpu.ops.pallas.knn_fused import window_knn
from lidar_slam_tpu.pipeline.aloam.odometry import sort_by_cell
from lidar_slam_tpu.geom.se3 import transform_points

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(10, speed=1.5)
fc = FeatureExtractionConfig()
pts, mask, _ = simulate_scan(world, traj[0], max_range=80.0, n_points=131072, seed=0, noise=0.01)
f0 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)
pts, mask, _ = simulate_scan(world, traj[1], max_range=80.0, n_points=131072, seed=1, noise=0.01)
f1 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)

# odometry-config grids
grid = build_bucket_grid(f0.less_flat, 5.0, (48, 48, 8))
o = sort_by_cell(grid, f1.flat.points, f1.flat.mask)
Q, QM = f1.flat.points[o], f1.flat.mask[o]
for w in (2048, 4096, 8192):
    r = window_knn(grid, Q, QM, k=8, max_radius=5.0, window=w)
    print(f"odom flat window={w}: unresolved={float(r['unresolved']):.0f}")
gridc = build_bucket_grid(f0.less_sharp, 5.0, (48, 48, 8))
o = sort_by_cell(gridc, f1.sharp.points, f1.sharp.mask)
r = window_knn(gridc, f1.sharp.points[o], f1.sharp.mask[o], k=8, max_radius=5.0, window=2048)
print("odom sharp window=2048: unresolved=", float(r["unresolved"]))

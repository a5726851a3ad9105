import numpy as np
import jax, jax.numpy as jnp
import dataclasses
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_spinning_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.pipeline.aloam import odometry as odom
from lidar_slam_tpu.ops.hashgrid import build_bucket_grid
from lidar_slam_tpu.geom.se3 import transform_points
from lidar_slam_tpu.ops import PointCloud

world = SyntheticWorld.corridor(length=80, seed=11)
traj = make_trajectory(8, speed=1.5)
fc = FeatureExtractionConfig(capacity=65536)
f = []
for i in range(2):
    pts, mask = simulate_spinning_scan(world, traj[i], n_scans=64, n_azimuth=1024, max_range=45.0, seed=i)
    f.append(extract_features(jnp.asarray(pts), jnp.asarray(mask), fc))

cfgx = odom.AloamOdometryConfig(knn="xla")
cfgf = odom.AloamOdometryConfig(knn="fused")

prev, cur = f[0], f[1]
grid = build_bucket_grid(prev.less_sharp, 5.0, (48, 48, 8))
o = odom.sort_by_cell(grid, cur.sharp.points, cur.sharp.mask)
Q = cur.sharp.points[o]; QM = cur.sharp.mask[o]

ax, bx, vx = odom._corner_correspondences(grid, prev.less_sharp.points, prev.less_sharp_ring, Q, QM, cfgx)
af, bf, vf = odom._corner_correspondences(grid, prev.less_sharp.points, prev.less_sharp_ring, Q, QM, cfgf)
vx, vf = np.asarray(vx), np.asarray(vf)
print("corner valid: xla", vx.sum(), "fused", vf.sum(), "both", (vx & vf).sum())
both = vx & vf
print("a match:", np.allclose(np.asarray(ax)[both], np.asarray(af)[both], atol=1e-4),
      "b match:", np.allclose(np.asarray(bx)[both], np.asarray(bf)[both], atol=1e-4))
d = np.linalg.norm(np.asarray(ax)[both]-np.asarray(af)[both], axis=1)
print("a dist mismatch frac:", (d > 1e-3).mean())
# also surf/plane
gridf = build_bucket_grid(prev.less_flat, 5.0, (48, 48, 8))
o2 = odom.sort_by_cell(gridf, cur.flat.points, cur.flat.mask)
Q2 = cur.flat.points[o2]; QM2 = cur.flat.mask[o2]
rx = odom._plane_correspondences(gridf, prev.less_flat.points, prev.less_flat_ring, Q2, QM2, cfgx)
rf = odom._plane_correspondences(gridf, prev.less_flat.points, prev.less_flat_ring, Q2, QM2, cfgf)
print("plane valid: xla", np.asarray(rx[3]).sum(), "fused", np.asarray(rf[3]).sum())

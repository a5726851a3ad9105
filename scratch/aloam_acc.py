import time
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.pipeline.aloam.mapping import AloamMapping, AloamMappingConfig
from lidar_slam_tpu.pipeline.aloam.odometry import AloamOdometry, AloamOdometryConfig

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(10, speed=1.5)
fc = FeatureExtractionConfig()
feats = []
for i in range(8):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.01)
    feats.append(extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc))

import sys
for knn in ("xla", "fused"):
    odo = AloamOdometry(AloamOdometryConfig(knn=knn))
    mapper = AloamMapping(AloamMappingConfig(knn=knn))
    errs_o, errs_m = [], []
    for i, f in enumerate(feats):
        T = odo.update(f)
        Tm = mapper.update(f, T)
        To = traj[0] @ np.asarray(T); errs_o.append(np.linalg.norm(To[:3,3] - traj[i][:3,3]))
        Tmw = traj[0] @ np.asarray(Tm); errs_m.append(np.linalg.norm(Tmw[:3,3] - traj[i][:3,3]))
    print(f"{knn}: odo end err {errs_o[-1]:.3f} m, map end err {errs_m[-1]:.3f} m, per-frame map errs {[f'{e:.2f}' for e in errs_m]}")

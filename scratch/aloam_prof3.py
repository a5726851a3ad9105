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
odo = AloamOdometry(AloamOdometryConfig())
mapper = AloamMapping(AloamMappingConfig())
for i, f in enumerate(feats):
    t0 = time.perf_counter()
    T = odo.update(f)
    t1 = time.perf_counter()
    Tm = mapper.update(f, T)
    t2 = time.perf_counter()
    print(f"frame {i}: odo {1e3*(t1-t0):.1f} ms, map {1e3*(t2-t1):.1f} ms")
print("end pose err:", np.linalg.norm(np.asarray(Tm)[:3,3] - traj[7][:3,3]))

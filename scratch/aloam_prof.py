"""Time the A-LOAM stages on TPU at KITTI-ish scale."""
import time
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.pipeline.aloam.odometry import odometry_step, AloamOdometryConfig, AloamOdometry
from lidar_slam_tpu.pipeline.aloam.mapping import AloamMapping, AloamMappingConfig

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
print("feature cfg:", fc)
scans = []
for i in range(3):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.01)
    scans.append((jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask)))

f_feat = jax.jit(lambda p, m: extract_features(p, m, fc))
feats = [f_feat(*s) for s in scans]
jax.block_until_ready(feats[0].sharp.points)
print(f"extract_features: {timeit(f_feat, *scans[0]):.1f} ms")

ocfg = AloamOdometryConfig()
f_odo = jax.jit(lambda a, b, c, d, e, f, g, h: odometry_step(a, b, c, d, e, f, g, h, cfg=ocfg)) if False else None
# call via class to get correct signature
odo = AloamOdometry(ocfg)
T1 = odo.update(feats[0])
t0 = time.perf_counter(); T2 = odo.update(feats[1]); dt_odo = (time.perf_counter()-t0)*1e3
t0 = time.perf_counter(); T3 = odo.update(feats[2]); dt_odo2 = (time.perf_counter()-t0)*1e3
print(f"odometry update: {dt_odo:.1f} / {dt_odo2:.1f} ms")

mapper = AloamMapping(AloamMappingConfig())
Tm = mapper.update(feats[0], T1)
t0 = time.perf_counter(); Tm = mapper.update(feats[1], T2); dt_map = (time.perf_counter()-t0)*1e3
t0 = time.perf_counter(); Tm = mapper.update(feats[2], T3); dt_map2 = (time.perf_counter()-t0)*1e3
print(f"mapping update: {dt_map:.1f} / {dt_map2:.1f} ms")

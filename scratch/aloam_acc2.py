import time
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_spinning_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.pipeline.aloam.mapping import AloamMapping, AloamMappingConfig
from lidar_slam_tpu.pipeline.aloam.odometry import AloamOdometry, AloamOdometryConfig

world = SyntheticWorld.corridor(length=80, seed=11)
traj = make_trajectory(8, speed=1.5)
fc = FeatureExtractionConfig(capacity=65536)
feats = []
for i in range(8):
    pts, mask = simulate_spinning_scan(world, traj[i], n_scans=64, n_azimuth=1024, max_range=45.0, seed=i)
    feats.append(extract_features(jnp.asarray(pts), jnp.asarray(mask), fc))
print("flat valid:", int(feats[0].flat.num_valid()), "less_flat:", int(feats[0].less_flat.num_valid()),
      "sharp:", int(feats[0].sharp.num_valid()), "less_sharp:", int(feats[0].less_sharp.num_valid()))

for knn in ("xla", "fused"):
    odo = AloamOdometry(AloamOdometryConfig(knn=knn))
    mapper = AloamMapping(AloamMappingConfig(knn=knn))
    errs, t_o, t_m = [], [], []
    for i, f in enumerate(feats):
        t0 = time.perf_counter(); T = odo.update(f); t1 = time.perf_counter()
        Tm = mapper.update(f, T); t2 = time.perf_counter()
        t_o.append(t1-t0); t_m.append(t2-t1)
        Tw = traj[0] @ np.asarray(Tm)
        errs.append(np.linalg.norm(Tw[:3,3] - traj[i][:3,3]))
    print(f"{knn}: end err {errs[-1]:.3f} m | errs {[f'{e:.2f}' for e in errs]} | "
          f"steady odo {np.mean(t_o[3:])*1e3:.0f} ms map {np.mean(t_m[3:])*1e3:.0f} ms")

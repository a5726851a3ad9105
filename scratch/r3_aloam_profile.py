"""Profile the A-LOAM pipeline stages on the TPU (find the 65 s/frame)."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_log_compiles", True)

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_spinning_scan
    from lidar_slam_tpu.pipeline.aloam import (
        AloamMapping,
        AloamMappingConfig,
        AloamOdometry,
        AloamOdometryConfig,
        FeatureExtractionConfig,
        extract_features,
    )

    fe_cfg = FeatureExtractionConfig(
        n_scans=64, min_range=2.5, capacity=65536,
        max_sharp=1024, max_less_sharp=8192, max_flat=2048, max_less_flat=16384,
    )
    odo = AloamOdometry(AloamOdometryConfig())
    mapping = AloamMapping(AloamMappingConfig())
    world = SyntheticWorld.corridor(length=60.0, width=18.0, density=30.0, seed=2)
    traj = make_trajectory(6, speed=0.8)
    frames = []
    for i in range(6):
        pts, mask = simulate_spinning_scan(world, traj[i], t=i * 0.1, n_scans=64, n_azimuth=1024, seed=i)
        p = np.zeros((fe_cfg.capacity, 3), np.float32)
        m = np.zeros(fe_cfg.capacity, bool)
        n = min(len(pts), fe_cfg.capacity)
        p[:n] = pts[:n]
        m[:n] = mask[:n]
        frames.append((jnp.asarray(p), jnp.asarray(m)))

    for i in range(6):
        t0 = time.time()
        f = extract_features(*frames[i], fe_cfg)
        jax.device_get(f.sharp.points[:1])
        t1 = time.time()
        T_odom = odo.update(f)  # device_get inside (np.asarray)
        t2 = time.time()
        T_map = mapping.update(f, T_odom)
        t3 = time.time()
        print(
            f"frame {i}: features {t1-t0:6.2f}s  odometry {t2-t1:6.2f}s  "
            f"mapping {t3-t2:6.2f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

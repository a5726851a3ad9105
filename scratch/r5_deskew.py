"""Tune the de-skew e2e: skewed spinning scans with/without adjust_cloud."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, simulate_scan, make_trajectory, ate_rmse
from lidar_slam_tpu.io.synthetic import skew_scan
from lidar_slam_tpu.models.registration import NDTConfig
from lidar_slam_tpu.models.scan_adjust import DistortionConfig, adjust_cloud
from lidar_slam_tpu.pipeline import FrontEndConfig
from lidar_slam_tpu.pipeline.front_end import front_end_drive, init_front_end_drive

CFG = FrontEndConfig(
    ndt=NDTConfig(resolution=1.0, grid_dims=(96, 96, 24), point_chunk=2048, max_iter=25),
    frame_capacity=8192,
    keyframe_capacity=8192,
    local_frame_num=10,
)

N = 20
CURVE = 0.06
SPEED = 1.5
PERIOD = 0.1
world = SyntheticWorld.corridor(length=60, seed=7, curve=CURVE)
gt = make_trajectory(N, speed=SPEED, curve=CURVE)

cap = CFG.raw_capacity
raw_seq = np.zeros((N, cap, 3), np.float32)
adj_seq = np.zeros((N, cap, 3), np.float32)
msk_seq = np.zeros((N, cap), bool)
for i in range(N):
    pts, mask, _ = simulate_scan(world, gt[i], t=i * PERIOD, max_range=35.0, n_points=8192, seed=500 + i)
    # true sensor-frame velocities over the sweep (frame period == scan period)
    if i + 1 < N:
        dT = np.linalg.inv(gt[i]) @ gt[i + 1]
    else:
        dT = np.linalg.inv(gt[i - 1]) @ gt[i]
    v = dT[:3, 3] / PERIOD
    yaw = np.arctan2(dT[1, 0], dT[0, 0])
    w = np.asarray([0.0, 0.0, yaw / PERIOD])
    skewed = skew_scan(pts, mask, w, v, scan_period=PERIOD)
    adjusted = np.asarray(
        adjust_cloud(jnp.asarray(skewed), jnp.asarray(mask), jnp.asarray(w, jnp.float32),
                     jnp.asarray(v, jnp.float32), DistortionConfig(scan_period=PERIOD))
    )
    n = len(pts)
    raw_seq[i, :n] = skewed
    adj_seq[i, :n] = adjusted
    msk_seq[i, :n] = mask

for tag, seq in [("skewed  ", raw_seq), ("adjusted", adj_seq)]:
    st = init_front_end_drive(CFG, init_pose=gt[0])
    _, poses, _, _ = front_end_drive(st, jnp.asarray(seq), jnp.asarray(msk_seq), CFG)
    ate = ate_rmse(np.asarray(poses), gt, align=False)
    print(f"{tag}: ATE {ate:.4f} m")

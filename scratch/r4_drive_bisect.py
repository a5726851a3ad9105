"""Bisect front_end_drive per-frame cost: track-only vs full keyframe path."""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, ndt_align
from lidar_slam_tpu.pipeline.front_end import (
    FrontEndConfig, front_end_drive, init_front_end_drive, _preprocess,
)

RAW = 131072
cfg = FrontEndConfig(
    ndt=NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                  max_iter=30, stencil="direct7", gather="auto",
                  max_compact_voxels=65536, fused_window=1024),
)
world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=0.8)
scans = []
for i in range(18):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=RAW, seed=3000 + i, noise=0.02)
    scans.append((jnp.asarray(pts), jnp.asarray(mask)))
pts_seq = jnp.stack([s[0] for s in scans[3:18]])
msk_seq = jnp.stack([s[1] for s in scans[3:18]])

# --- full drive (as bench)
st = init_front_end_drive(cfg, init_pose=traj[3])
st, dposes, dkfs, _ = front_end_drive(st, pts_seq, msk_seq, cfg)
jax.device_get(dposes)
for rep in range(3):
    t0 = time.time()
    st2 = init_front_end_drive(cfg, init_pose=traj[3])
    st2, dposes, dkfs, _ = front_end_drive(st2, pts_seq, msk_seq, cfg)
    dposes = jax.device_get(dposes)
    print(f"full drive rep{rep}: {(time.time()-t0)/15*1000:.1f} ms/frame ({int(np.asarray(dkfs).sum())} kf)")

# --- track-only scan: same shapes, no keyframe branch (static maps)
fine_cfg = dataclasses.replace(cfg.ndt, dense_stats=False)
coarse_cfg = dataclasses.replace(cfg.ndt, resolution=2.0,
                                 grid_dims=(128, 128, 32), dense_stats=False,
                                 fused_window=1024)
st3 = init_front_end_drive(cfg, init_pose=traj[3])
# build maps once by running the drive for 3 frames
st3, _, _, _ = front_end_drive(st3, pts_seq[:3], msk_seq[:3], cfg)

@jax.jit
def track_only(st, pts_seq, msk_seq):
    def one(carry, inp):
        guess, last = carry
        points, mask = inp
        frame = _preprocess.__wrapped__(points, mask, cfg.frame_capacity, cfg.frame_leaf)
        g = ndt_align(st.coarse_map, frame, guess, coarse_cfg).pose
        r = ndt_align(st.fine_map, frame, g, fine_cfg)
        step = jnp.linalg.solve(last, r.pose)
        return (r.pose @ step, r.pose), r.pose

    (_, _), poses = jax.lax.scan(one, (st.last_pose, st.last_pose), (pts_seq, msk_seq))
    return poses

poses = track_only(st3, pts_seq, msk_seq)
jax.device_get(poses)
for rep in range(3):
    t0 = time.time()
    poses = track_only(st3, pts_seq, msk_seq)
    jax.device_get(poses)
    print(f"track-only rep{rep}: {(time.time()-t0)/15*1000:.1f} ms/frame")

# --- preprocess-only scan
@jax.jit
def prep_only(pts_seq, msk_seq):
    def one(c, inp):
        points, mask = inp
        f = _preprocess.__wrapped__(points, mask, cfg.frame_capacity, cfg.frame_leaf)
        return c, f.points.sum()
    return jax.lax.scan(one, 0, (pts_seq, msk_seq))[1]

s = prep_only(pts_seq, msk_seq); jax.device_get(s)
t0 = time.time()
s = prep_only(pts_seq, msk_seq); jax.device_get(s)
print(f"preprocess-only: {(time.time()-t0)/15*1000:.1f} ms/frame")

import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import _ndt_derivatives_fused, _flat_vid
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
mc = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
base = NDTConfig(resolution=1.0, grid_dims=(256,256,64), stencil="direct7",
                 max_compact_voxels=8192, gather="fused")
ndt_map = build_ndt_map(mc, base)

pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
fr = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
fr = voxel_downsample(fr, 0.5, out_capacity=32768)
pose6 = jnp.asarray([0.1,0.05,0.0,0.0,0.0,0.02], jnp.float32)

# as ndt_align does: sort by vid at init pose
from lidar_slam_tpu.geom.se3 import euler_xyz_to_matrix
R = euler_xyz_to_matrix(pose6[3], pose6[4], pose6[5])
xp0 = fr.points @ R.T + pose6[:3]
cell0 = jnp.floor((xp0 - ndt_map.origin) / 1.0).astype(jnp.int32)
vid0 = jnp.where(fr.mask, _flat_vid(cell0, base.grid_dims), 2**30)
order = jnp.argsort(vid0)
pts_s, mask_s = fr.points[order], fr.mask[order]

for stencil in ("direct7", "radius27"):
    cfg = dataclasses.replace(base, stencil=stencil)
    u = _ndt_derivatives_fused(ndt_map, pts_s, mask_s, pose6, cfg, None, True)[3]
    # also after a simulated 0.5 m pose drift mid-alignment (order gets stale)
    pose_d = pose6 + jnp.asarray([0.5, 0.3, 0.0, 0.0, 0.0, 0.03])
    u2 = _ndt_derivatives_fused(ndt_map, pts_s, mask_s, pose_d, cfg, None, True)[3]
    print(f"{stencil}: unresolved sorted={float(u)} drifted={float(u2)}")

"""Round-2 verify drive: fused NDT align on the real TPU with the new
unresolved guard, plus quat-prior pose-graph optimize."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align, ndt_fitness_score
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

print("devices:", jax.devices())
cfg = NDTConfig(resolution=1.0, grid_dims=(128, 128, 32), gather="auto", stencil="direct7")
world = SyntheticWorld.corridor(length=60.0, width=18.0, density=30.0, seed=0)
traj = make_trajectory(10, speed=2.0)
pts_list = []
for i in range(0, 10, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=60.0, n_points=32768, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    pts_list.append(w[:8192])
map_cloud = PointCloud.from_points(np.concatenate(pts_list).astype(np.float32))
map_cloud = voxel_downsample(map_cloud, 0.3, out_capacity=map_cloud.capacity)
m = build_ndt_map(map_cloud, cfg)
jax.block_until_ready(m.packed)
print("map built:", int((np.asarray(m.keys) >= 0).sum()), "compact rows")

pts, mask, _ = simulate_scan(world, traj[5], max_range=60.0, n_points=32768, seed=99, noise=0.02)
guess = traj[5].copy()
guess[:3, 3] += np.array([0.3, -0.2, 0.05], np.float32)
src = PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask))
src = voxel_downsample(src, 0.5, out_capacity=16384)
t0 = time.time()
r = ndt_align(m, src, jnp.asarray(guess, jnp.float32), cfg)
jax.block_until_ready(r.pose)
print(f"align compile+run: {time.time()-t0:.1f}s")
err = float(np.linalg.norm(np.asarray(r.pose)[:3, 3] - traj[5][:3, 3]))
fit = float(ndt_fitness_score(m, src, r.pose, cfg))
print(f"pose err {err:.4f} m, iters {int(r.iterations)}, unresolved {float(r.unresolved)}, fitness {fit:.4f}")
assert err < 0.1, err
assert float(r.unresolved) == 0.0
assert fit < 0.2, fit
print("TPU drive OK")

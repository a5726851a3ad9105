"""Separate true kernel/eval time from dispatch overhead: chain 20 evals in
ONE jitted program (serial dependency through the pose) and compare with the
20-dispatch protocol. Also time the wrapper (rows building) alone."""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import ndt_derivatives
from lidar_slam_tpu.ops.pointcloud import PointCloud, voxel_downsample

world = SyntheticWorld.corridor(length=200.0, width=24.0, density=80.0, seed=3)
traj = make_trajectory(40, speed=0.8)
clouds = []
for i in range(20):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=100+i, noise=0.02)
    f = voxel_downsample(PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask)), 0.5, out_capacity=16384)
    T = traj[i]
    w = np.asarray(f.points) @ T[:3,:3].T + T[:3,3]
    clouds.append((w, np.asarray(f.mask)))
allp = np.concatenate([c[0] for c in clouds]); allm = np.concatenate([c[1] for c in clouds])
tgt = PointCloud(points=jnp.asarray(allp), mask=jnp.asarray(allm))

pts, mask, _ = simulate_scan(world, traj[10], max_range=80.0, n_points=131072, seed=999, noise=0.02)
src = voxel_downsample(PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask)), 0.5, out_capacity=32768)
from lidar_slam_tpu.geom.se3 import matrix_to_euler_xyz
T10 = traj[10]
eul = np.asarray(matrix_to_euler_xyz(jnp.asarray(T10[:3,:3])))
guess = jnp.asarray(np.concatenate([T10[:3,3], eul]).astype(np.float32))

dims = (256, 256, 64)
K = 20
for mcv in (65536, 32768, 16384):
  cfg = NDTConfig(resolution=1.0, grid_dims=dims, point_chunk=8192, max_iter=30,
                stencil="direct7", gather="fused", max_compact_voxels=mcv,
                fused_window=512, fused_tile=1024, dense_stats=False)
  m = build_ndt_map(tgt, cfg, origin=jnp.asarray(np.floor((T10[:3,3] - 0.5*np.asarray(dims)*1.0)/1.0)*1.0))
  print(f"--- max_compact_voxels={mcv}", flush=True)

  @jax.jit
  def chained(m, s_pts, s_msk, g):
      def body(carry, _):
          pose, acc = carry
          sc, gr, he, un = ndt_derivatives(m, s_pts, s_msk, pose, cfg, True, return_unresolved=True)
          # serial dependency: nudge the pose by a score-dependent epsilon
          pose = pose + 1e-9 * sc * jnp.ones(6, jnp.float32)
          return (pose, acc + sc + un), None
      (pose, acc), _ = jax.lax.scan(body, (g, jnp.float32(0.0)), None, length=K)
      return pose, acc

  out = chained(m, src.points, src.mask, guess); jax.device_get(out[1])
  t0 = time.time()
  for _ in range(3):
      out = chained(m, src.points, src.mask, guess)
  jax.device_get(out[1])
  per = (time.time()-t0)/3/K*1000
  print(f"chained eval ({K} in one program): {per:.3f} ms/eval", flush=True)

  # single-dispatch protocol for reference
  f1 = jax.jit(lambda m, p, k, g: ndt_derivatives(m, p, k, g, cfg, True, return_unresolved=True))
  o = f1(m, src.points, src.mask, guess); jax.device_get(o[0])
  t0 = time.time()
  for _ in range(20):
      o = f1(m, src.points, src.mask, guess)
  jax.device_get(o[0])
  print(f"dispatched eval: {(time.time()-t0)/20*1000:.3f} ms/eval", flush=True)


"""Round-5 A/B: [8, gsz] sublane-relaid fused kernel — eval time + exactness
at KITTI-scale shapes, sweeping window and tile."""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
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

for stencil, dims, res in [("direct7", (256,256,64), 1.0), ("radius27", (256,256,64), 1.0)]:
    for tile in (1024, 2048):
        for W in (1536, 1024, 512, 384):
            cfg = NDTConfig(resolution=res, grid_dims=dims, point_chunk=8192, max_iter=30,
                            stencil=stencil, gather="fused", max_compact_voxels=65536,
                            fused_window=W, fused_tile=tile, dense_stats=False)
            m = build_ndt_map(tgt, cfg, origin=jnp.asarray(np.floor((traj[10][:3,3] - 0.5*np.asarray(dims)*res)/res)*res))
            f = jax.jit(lambda m, s, g: ndt_derivatives(m, s.points, s.mask, g, cfg, return_unresolved=True))
            out = f(m, src, guess)
            jax.device_get(out[0])
            t0 = time.time()
            for _ in range(20):
                out = f(m, src, guess)
            jax.device_get(out[0])
            dt = (time.time()-t0)/20*1000
            unres = float(np.asarray(out[3]))
            print(f"{stencil} tile={tile} W={W}: eval {dt:.2f} ms, unresolved {unres}", flush=True)

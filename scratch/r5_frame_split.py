"""Split the bench drive frame (~13 ms) into its stages, all chained x20 in
one program: (a) preprocess only, (b) preprocess+sort, (c) full align with
max_iter=1, (d) full align max_iter=30 (the bench leg)."""
import dataclasses, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
from lidar_slam_tpu.models.registration.ndt import sort_points_by_vid
from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample
from lidar_slam_tpu.ops.pointcloud import voxel_downsample_dense

RAW_CAP = 131072
FRAME_CAP = 32768

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf_pts = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=RAW_CAP, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf_pts.append(w[:16384])
map_cloud = PointCloud.from_points(np.concatenate(kf_pts).astype(np.float32))
map_cloud = voxel_downsample(map_cloud, 0.3, out_capacity=map_cloud.capacity)

pts, mask, _ = simulate_scan(world, traj[10], max_range=80.0, n_points=RAW_CAP, seed=1000, noise=0.02)
pts_d, msk_d = jnp.asarray(pts), jnp.asarray(mask)
guess0 = jnp.asarray(traj[10])

cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                max_iter=30, stencil="direct7", gather="fused",
                max_compact_voxels=65536, fused_window=512, dense_stats=False)
m = build_ndt_map(map_cloud, cfg)

K = 20

def timed(name, fn, *args):
    out = fn(*args); jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name}: {(time.time()-t0)/3/K*1000:.3f} ms/frame-stage", flush=True)

@jax.jit
def pre_only(p, k):
    def body(acc, _):
        mm = k & finite_mask(p)
        cloud = PointCloud(points=jnp.where(mm[:, None], p + acc * 1e-12, 0.0), mask=mm)
        frame = voxel_downsample_dense(cloud, 0.5, out_capacity=FRAME_CAP)
        return acc + jnp.sum(frame.points[0]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
    return acc

@jax.jit
def pre_sort(p, k, g):
    def body(acc, _):
        mm = k & finite_mask(p)
        cloud = PointCloud(points=jnp.where(mm[:, None], p + acc * 1e-12, 0.0), mask=mm)
        frame = voxel_downsample_dense(cloud, 0.5, out_capacity=FRAME_CAP)
        sp, sm, sw = sort_points_by_vid(m, frame.points, frame.mask, frame.get_weights(), g)
        return acc + jnp.sum(sp[0]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
    return acc

def align_with(max_iter):
    c = dataclasses.replace(cfg, max_iter=max_iter)
    @jax.jit
    def f(p, k, g):
        def body(carry, _):
            acc, gg = carry
            mm = k & finite_mask(p)
            cloud = PointCloud(points=jnp.where(mm[:, None], p + acc * 1e-12, 0.0), mask=mm)
            frame = voxel_downsample_dense(cloud, 0.5, out_capacity=FRAME_CAP)
            r = ndt_align(m, frame, gg, c)
            return (acc + r.score * 1e-12, r.pose), None
        (acc, pose), _ = jax.lax.scan(body, (jnp.float32(0.0), g), None, length=K)
        return pose
    return f

timed("preprocess only       ", pre_only, pts_d, msk_d)
timed("preprocess + sort     ", pre_sort, pts_d, msk_d, guess0)
timed("pre + align max_iter=1", align_with(1), pts_d, msk_d, guess0)
timed("pre + align max_iter=30", align_with(30), pts_d, msk_d, guess0)

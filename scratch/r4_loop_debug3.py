import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, tempfile
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig
from lidar_slam_tpu.models.scan_context import ScanContextConfig
from lidar_slam_tpu.models.registration import ndt_align, ndt_fitness_score, build_ndt_map
from lidar_slam_tpu.ops.pointcloud import PointCloud, voxel_downsample
from lidar_slam_tpu.geom.se3 import euler_xyz_to_matrix

for density in (30.0, 80.0):
    world = SyntheticWorld.corridor(length=60.0, width=16.0, density=density, seed=9)
    gt = make_hairpin_trajectory(n_out=14, n_turn=16, n_back=12, speed=1.0, turn_radius=1.0)
    with tempfile.TemporaryDirectory() as root:
        store = KeyframeStore(root)
        cfg = LoopClosingConfig(loop_step=1, diff_num=20, sc=ScanContextConfig(num_exclude_recent=20))
        lc = LoopClosing(cfg, store)
        for i in (7, 8, 9, 10, 11, 34):
            pts, mask, _ = simulate_scan(world, gt[i], t=i*0.1, max_range=45.0, n_points=16384, seed=900+i)
            kept = pts[mask]
            store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i*0.1)
        for i in range(len(gt)):
            lc.key_poses.append(np.asarray(gt[i], np.float32))
        index0, index1 = 9, 34
        pts_list = []
        for k in range(7, 12):
            rec = store.load(k); T = lc.key_poses[k]
            p = rec["points"][rec["mask"]]
            pts_list.append(p @ T[:3,:3].T + T[:3,3])
        sub = np.concatenate(pts_list)
        raw_cap = max(cfg.submap_capacity, ((len(sub)+65535)//65536)*65536)
        submap = PointCloud.from_points(sub, capacity=raw_cap)
        submap = voxel_downsample(submap, cfg.map_filter_leaf, out_capacity=cfg.submap_capacity)
        ndt_map = build_ndt_map(submap, cfg.ndt)
        rec1 = store.load(index1)
        scan = PointCloud(points=jnp.asarray(rec1["points"]), mask=jnp.asarray(rec1["mask"]))
        scan = voxel_downsample(scan, cfg.scan_filter_leaf, out_capacity=cfg.scan_capacity)

        # plain gt guess, and a yaw-drifted guess (heading off by +0.5 rad)
        for name, dyaw in [("gt", 0.0), ("drift+0.5", 0.5), ("drift-0.5", -0.5)]:
            g = lc.key_poses[index1].copy()
            Rz = np.asarray(euler_xyz_to_matrix(jnp.float32(0), jnp.float32(0), jnp.float32(dyaw)))
            g[:3, :3] = Rz @ g[:3, :3]  # world-frame heading drift
            result = ndt_align(ndt_map, scan, jnp.asarray(g), cfg.ndt)
            fit = float(ndt_fitness_score(ndt_map, scan, result.pose, cfg.ndt))
            err = np.linalg.norm(np.asarray(result.pose)[:3,3] - gt[index1][:3,3])
            print(f"density {density} {name}: fitness {fit:.4f} err {err:.3f}")

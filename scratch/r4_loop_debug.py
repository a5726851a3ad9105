import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import tempfile

from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig
from lidar_slam_tpu.models.scan_context import ScanContextConfig

world = SyntheticWorld.corridor(length=60.0, width=16.0, density=30.0, seed=9)
gt = make_hairpin_trajectory(n_out=14, n_turn=16, n_back=12, speed=1.0, turn_radius=1.0)
print("n frames:", len(gt))
with tempfile.TemporaryDirectory() as root:
    store = KeyframeStore(root)
    cfg = LoopClosingConfig(
        loop_step=1, diff_num=20, sc=ScanContextConfig(num_exclude_recent=20)
    )
    lc = LoopClosing(cfg, store)
    detected = None
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(
            world, gt[i], t=i * 0.1, max_range=45.0, n_points=16384, seed=900 + i
        )
        kept = pts[mask]
        store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i * 0.1)
        loop = lc.update(i, gt[i])
        if loop is not None:
            print(f"frame {i}: LOOP {loop.index0}->{loop.index1}")
            if detected is None:
                detected = (loop.index0, loop.index1)
    print("detected:", detected)
    # instrument: what does sc.detect say at the end?
    cand = lc.sc.detect()
    print("sc.detect tail:", cand)
    # distances between hairpin pairs
    print("traj xy range out:", gt[5][:2, 3], " back:", gt[35][:2, 3])

# --- second pass: instrument per-frame detection + verification
with tempfile.TemporaryDirectory() as root:
    store = KeyframeStore(root)
    cfg = LoopClosingConfig(
        loop_step=1, diff_num=20, sc=ScanContextConfig(num_exclude_recent=20)
    )
    lc = LoopClosing(cfg, store)
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(
            world, gt[i], t=i * 0.1, max_range=45.0, n_points=16384, seed=900 + i
        )
        kept = pts[mask]
        store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i * 0.1)
        kf_pose = gt[i]
        lc.key_poses.append(np.asarray(kf_pose, np.float32))
        lc.key_gnss.append(kf_pose[:3, 3].copy())
        rec = store.load(i)
        lc.sc.add(rec["points"], rec["mask"])
        idx, dist, yaw = lc.sc.detect()
        if idx >= 0 and i - idx >= cfg.diff_num:
            loop = lc._verify(idx, i, yaw)
            fit = None if loop is None else loop.fitness
            print(f"frame {i}: cand {idx} dist {dist:.3f} yaw {yaw:.2f} -> verify {fit}")
        elif idx >= 0:
            print(f"frame {i}: cand {idx} dist {dist:.3f} (diff {i-idx} < 20)")

"""Drive the fixed loop-closing path on the real TPU chip."""
import time, tempfile
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
print("devices:", jax.devices())
from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig
from lidar_slam_tpu.models.scan_context import ScanContextConfig

world = SyntheticWorld.corridor(length=60.0, width=16.0, density=30.0, seed=9)
gt = make_hairpin_trajectory(n_out=14, n_turn=16, n_back=12, speed=1.0, turn_radius=1.0)
with tempfile.TemporaryDirectory() as root:
    store = KeyframeStore(root)
    cfg = LoopClosingConfig(loop_step=1, diff_num=20, sc=ScanContextConfig(num_exclude_recent=20))
    lc = LoopClosing(cfg, store)
    detected = None
    t0 = time.time()
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(world, gt[i], t=i*0.1, max_range=45.0, n_points=16384, seed=900+i)
        kept = pts[mask]
        store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i*0.1)
        loop = lc.update(i, gt[i])
        if loop is not None and detected is None:
            detected = (loop.index0, loop.index1)
            print(f"first loop: {loop.index0}->{loop.index1} fitness {loop.fitness:.4f}")
    print(f"drive {time.time()-t0:.1f}s, loops accepted: {len(lc.detected)}")
    assert detected is not None
    idx0, idx1 = detected
    lc.sc.detect(); lc._verify(idx0, idx1, 0.0)  # warm
    t0 = time.time()
    for _ in range(5):
        lc.sc.detect()
    detect_ms = (time.time()-t0)/5*1000
    t0 = time.time()
    for _ in range(5):
        out = lc._verify(idx0, idx1, 0.0)
    verify_ms = (time.time()-t0)/5*1000
    assert out is not None
    print(f"sc retrieval {detect_ms:.1f} ms, verify {verify_ms:.1f} ms, fitness {out.fitness:.4f}")
    print("TPU loop drive OK")

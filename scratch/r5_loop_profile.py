"""Round-5: loop-verify stage breakdown + SC retrieval growth on the TPU."""
import dataclasses, tempfile, time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
from lidar_slam_tpu.io.keyframe_store import KeyframeStore
from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig, _verify_step
from lidar_slam_tpu.models.scan_context import SCManager, ScanContextConfig, detect_loop, make_scancontext, ring_key
from lidar_slam_tpu.models.registration import build_ndt_map, ndt_align, point_nn_fitness_score
from lidar_slam_tpu.ops.pointcloud import PointCloud, voxel_downsample

world = SyntheticWorld.corridor(length=60.0, width=16.0, density=30.0, seed=9)
gt = make_hairpin_trajectory(n_out=14, n_turn=16, n_back=12, speed=1.0, turn_radius=1.0)
with tempfile.TemporaryDirectory() as root:
    store = KeyframeStore(root)
    cfg = LoopClosingConfig(loop_step=1, diff_num=20, sc=ScanContextConfig(num_exclude_recent=20))
    lc = LoopClosing(cfg, store)
    detected = None
    for i in range(len(gt)):
        pts, mask, _ = simulate_scan(world, gt[i], t=i * 0.1, max_range=45.0, n_points=16384, seed=900 + i)
        kept = pts[mask]
        store.save(i, kept, np.ones(len(kept), bool), gt[i], time=i * 0.1)
        loop = lc.update(i, gt[i])
        if loop is not None and detected is None:
            detected = (loop.index0, loop.index1)
    assert detected is not None
    idx0, idx1 = detected
    print(f"pair {idx0}->{idx1}", flush=True)

    # full fused verify
    lc._verify(idx0, idx1, 0.0)
    t0 = time.time()
    for _ in range(5):
        out = lc._verify(idx0, idx1, 0.0)
    print(f"full _verify: {(time.time()-t0)/5*1000:.1f} ms (fitness {out.fitness:.3f})", flush=True)

    # stage breakdown: rebuild the inputs _verify prepares
    vcfg = lc.cfg
    pts_list = []
    for k in range(max(0, idx0 - vcfg.extend_frame_num), min(len(lc.key_poses), idx0 + vcfg.extend_frame_num + 1)):
        rec = store.load(k)
        T = lc.key_poses[k]
        p = rec["points"][rec["mask"]]
        pts_list.append(p @ T[:3, :3].T + T[:3, 3])
    sub = np.concatenate(pts_list)
    bucket = 65536
    raw_cap = max(vcfg.submap_capacity, ((len(sub) + bucket - 1) // bucket) * bucket)
    sub_pts = np.zeros((raw_cap, 3), np.float32); sub_pts[: len(sub)] = sub[:raw_cap]
    sub_msk = np.zeros(raw_cap, bool); sub_msk[: min(len(sub), raw_cap)] = True
    rec1 = store.load(idx1)
    guess = jnp.asarray(lc.key_poses[idx1])
    sub_pts_d, sub_msk_d = jnp.asarray(sub_pts), jnp.asarray(sub_msk)
    scan_pts_d, scan_msk_d = jnp.asarray(rec1["points"]), jnp.asarray(rec1["mask"])
    ndt_cfg = dataclasses.replace(vcfg.ndt, dense_stats=False)

    f_down = jax.jit(lambda p, m: voxel_downsample(PointCloud(points=p, mask=m), vcfg.map_filter_leaf, out_capacity=vcfg.submap_capacity))
    f_down_scan = jax.jit(lambda p, m: voxel_downsample(PointCloud(points=p, mask=m), vcfg.scan_filter_leaf, out_capacity=vcfg.scan_capacity))
    f_build = jax.jit(lambda c: build_ndt_map(c, ndt_cfg))
    f_align = jax.jit(lambda m, s, g: ndt_align(m, s, g, ndt_cfg).pose)
    f_fit = jax.jit(lambda sm, sc, p: point_nn_fitness_score(sm, sc, p))

    submap = f_down(sub_pts_d, sub_msk_d); jax.device_get(submap.points[0])
    scan = f_down_scan(scan_pts_d, scan_msk_d); jax.device_get(scan.points[0])
    m = f_build(submap); jax.device_get(m.keys[0])
    pose = f_align(m, scan, guess); jax.device_get(pose)
    fit = f_fit(submap, scan, pose); jax.device_get(fit)

    def t5(fn, *a):
        t0 = time.time()
        for _ in range(5):
            out = fn(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        return (time.time()-t0)/5*1000
    print(f"downsample submap: {t5(f_down, sub_pts_d, sub_msk_d):.1f} ms", flush=True)
    print(f"downsample scan:   {t5(f_down_scan, scan_pts_d, scan_msk_d):.1f} ms", flush=True)
    print(f"build_ndt_map:     {t5(f_build, submap):.1f} ms", flush=True)
    print(f"ndt_align:         {t5(f_align, m, scan, guess):.1f} ms", flush=True)
    print(f"fitness:           {t5(f_fit, submap, scan, pose):.1f} ms", flush=True)

# --- SC retrieval growth: 200 / 800 / 3200 stored descriptors ------------
sccfg = ScanContextConfig()
rng = np.random.default_rng(0)
for hist in (200, 800, 3200):
    descs = jnp.asarray(rng.uniform(0, 8, (hist, sccfg.num_rings, sccfg.num_sectors)).astype(np.float32))
    rks = jax.vmap(ring_key)(descs)
    q = descs[-1]
    qrk = rks[-1]
    mask = jnp.arange(hist) < hist - 50
    f = jax.jit(lambda q, qrk, d, r, m: detect_loop(q, qrk, d, r, m, sccfg))
    out = f(q, qrk, descs, rks, mask); jax.device_get(out[0])
    t0 = time.time()
    for _ in range(10):
        out = f(q, qrk, descs, rks, mask)
    jax.device_get(out[0])
    print(f"SC detect @ {hist} descriptors: {(time.time()-t0)/10*1000:.1f} ms", flush=True)

"""Benchmark suite: TPU-vs-CPU NDT registration throughput plus the other
reference-anchored hot paths. Prints one JSON line per metric; the HEADLINE
metric (`ndt_scan_match_fps`) prints LAST with
`vs_baseline = fps_TPU / fps_CPU` — the driver-defined >=5x target
(BASELINE.md: registration frames/s per TPU chip >= 5x the CPU rate at the
identical operating point).

Metrics:
  ndt_cpu_fps              XLA-CPU two_level path, same workload (the measured
                           CPU baseline BASELINE.md round-1/2 lacked; runs in a
                           JAX_PLATFORMS=cpu subprocess concurrently)
  pose_graph_ms_per_iter   366-node/366-edge LM solve (reference laptop log:
                           0.0916 s / 25 iters = 3.7 ms/iter,
                           Log/back_end_node.*.20210718)
  map_update_ms            per-keyframe incremental NDT map maintenance
                           (evict + scatter + recondition, fine+coarse —
                           VoxelGrid.cpp:545-809 semantics)
  front_end_e2e_fps        full FrontEnd.update loop (preprocess + coarse-to-
                           fine align + keyframe/map maintenance amortized)
  ndt_scan_match_fps_radius27  reference-exact radiusSearch semantics
                           (NormalDistributionsTransform.cpp:424)
  ndt_scan_match_fps       HEADLINE: direct7 fused production operating point

Timing protocol: frames are chained inside one jitted lax.scan — frame i's
pose feeds the motion-model guess of frame i+1 (front_end.cpp:238-240), so
nothing can pipeline across frames and the number is honest sequential
throughput. Exactness gates (asserted every run, VERDICT r2 #7):
  * fused-kernel `unresolved` == 0 across ALL frames,
  * fused-vs-XLA derivative parity at the operating point,
  * pose error vs ground truth <= 0.10 m mean.

Workload: KITTI HDL-64 scale (config/mapping/front_end.yaml operating
point) — 20-keyframe local map at 0.3 m leaf, [131072]-padded raw scans
voxel-filtered to <=32768 points, res 1.0 m, max 30 Newton iterations.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

RAW_CAP = 131072
FRAME_CAP = 32768
N_FRAMES = 20


def _emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 3)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_workload():
    """Shared corridor workload: (map_cloud, frames, gt poses, guess0)."""
    import jax.numpy as jnp

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
    from lidar_slam_tpu.ops import PointCloud, voxel_downsample

    world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
    traj = make_trajectory(40, speed=2.0)
    kf_pts = []
    for i in range(0, 40, 2):
        pts, mask, _ = simulate_scan(
            world, traj[i], max_range=80.0, n_points=RAW_CAP, seed=i, noise=0.015
        )
        w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
        kf_pts.append(w[:16384])
    map_cloud = PointCloud.from_points(np.concatenate(kf_pts).astype(np.float32))
    map_cloud = voxel_downsample(map_cloud, 0.3, out_capacity=map_cloud.capacity)

    all_pts = np.zeros((N_FRAMES, RAW_CAP, 3), np.float32)
    all_msk = np.zeros((N_FRAMES, RAW_CAP), bool)
    for i in range(N_FRAMES):
        pts, mask, _ = simulate_scan(
            world, traj[10 + i], max_range=80.0, n_points=RAW_CAP,
            seed=1000 + i, noise=0.02,
        )
        all_pts[i] = pts
        all_msk[i] = mask
    gt = traj[10:10 + N_FRAMES]
    rng = np.random.default_rng(7)
    guess0 = gt[0].copy()
    guess0[:3, 3] += rng.normal(0, 0.3, 3)
    return map_cloud, jnp.asarray(all_pts), jnp.asarray(all_msk), gt, jnp.asarray(guess0)


def make_drive(ndt_map, cfg):
    """Jitted sequential 20-frame drive: preprocess -> align, pose chained
    into the next frame's motion-model prediction."""
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.models.registration import ndt_align
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    @jax.jit
    def drive(m_arg, pts_seq, msk_seq, guess_init):
        def one(carry, inp):
            last_pose, predict = carry
            points, mask = inp
            m = mask & finite_mask(points)
            cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
            frame = voxel_downsample(cloud, 0.5, out_capacity=FRAME_CAP)
            r = ndt_align(m_arg, frame, predict, cfg)
            step = jnp.linalg.solve(last_pose, r.pose)
            return (r.pose, r.pose @ step), (r.pose, r.iterations, r.unresolved)

        _, outs = jax.lax.scan(one, (guess_init, guess_init), (pts_seq, msk_seq))
        return outs

    return drive


def scan_match_leg(name, cfg, workload, err_limit=0.10):
    """Measure one operating point; returns fps. Asserts the quality gates."""
    import jax

    from lidar_slam_tpu.models.registration import build_ndt_map

    map_cloud, all_pts, all_msk, gt, guess0 = workload
    t0 = time.time()
    ndt_map = build_ndt_map(map_cloud, cfg)
    # NOTE: device_get is the only reliable fence on the axon backend
    # (block_until_ready returns before remote execution completes)
    jax.device_get(ndt_map.origin)
    _log(f"[{name}] map build: {time.time()-t0:.1f}s, "
         f"{int(np.asarray(ndt_map.valid).sum())} valid voxels")

    drive = make_drive(ndt_map, cfg)
    t0 = time.time()
    out = drive(ndt_map, all_pts, all_msk, guess0)
    jax.device_get(out[1])
    _log(f"[{name}] compile: {time.time()-t0:.1f}s")

    t0 = time.time()
    poses, iters, unres = jax.device_get(drive(ndt_map, all_pts, all_msk, guess0))
    dt = time.time() - t0
    fps = N_FRAMES / dt

    errs = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    _log(f"[{name}] {dt/N_FRAMES*1000:.1f} ms/frame, iters mean "
         f"{np.mean(iters):.1f}, err mean {errs.mean():.3f} max {errs.max():.3f} m, "
         f"unresolved max {float(unres.max())}")
    # exactness gate: every fused frame fully resolved inside the key window
    assert float(unres.max()) == 0.0, (
        f"{name}: fused kernel dropped derivative terms (unresolved="
        f"{float(unres.max())}) — widen NDTConfig.fused_window"
    )
    assert errs.mean() <= err_limit, f"{name}: pose error guard failed ({errs.mean():.3f} m)"
    return fps, float(np.mean(iters))


def derivative_parity_gate(cfg, workload):
    """Fused Pallas kernel vs exact XLA two_level derivatives at the
    production operating point — asserted every bench run (VERDICT r2 #7)."""
    import jax.numpy as jnp

    from lidar_slam_tpu.models.registration import build_ndt_map, ndt_derivatives
    from lidar_slam_tpu.models.registration.ndt import sort_points_by_vid
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    map_cloud, all_pts, all_msk, gt, guess0 = workload
    ndt_map = build_ndt_map(map_cloud, cfg)
    m = all_msk[0] & finite_mask(all_pts[0])
    cloud = PointCloud(points=jnp.where(m[:, None], all_pts[0], 0.0), mask=m)
    frame = voxel_downsample(cloud, 0.5, out_capacity=FRAME_CAP)
    pose6 = jnp.zeros(6).at[:3].set(jnp.asarray(guess0)[:3, 3])

    pts, msk, w = sort_points_by_vid(ndt_map, frame.points, frame.mask, frame.get_weights(), guess0)
    s_f, g_f, h_f, u_f = ndt_derivatives(
        ndt_map, pts, msk, pose6, cfg, True, weights=w, return_unresolved=True
    )
    cfg_x = dataclasses.replace(cfg, gather="two_level")
    s_x, g_x, h_x = ndt_derivatives(ndt_map, pts, msk, pose6, cfg_x, True, weights=w)
    assert float(u_f) == 0.0
    np.testing.assert_allclose(float(s_f), float(s_x), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_x), rtol=2e-3, atol=1e-2)
    _log(f"[parity] fused == two_level at operating point "
         f"(score {float(s_f):.4f}, |g| {float(jnp.linalg.norm(g_f)):.4f})")


def pose_graph_leg():
    """366 nodes / 365 odometry edges + 1 loop edge, LM with dense-MXU solve
    (the reference's logged g2o case: 25/512 iters, 0.0916 s)."""
    import jax

    from lidar_slam_tpu.geom import se3_exp
    from lidar_slam_tpu.models.graph_optimizer import (
        GraphOptimizerConfig,
        PoseGraphBuilder,
        optimize_pose_graph,
    )
    import jax.numpy as jnp

    n = 366
    rng = np.random.default_rng(0)
    gt = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array(
            [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
            np.float32,
        )
        T[:3, 3] = [60 * np.cos(theta), 60 * np.sin(theta), 0.0]
        gt.append(T)
    # capacity sized to the case (366 nodes -> 2304-dim dense solve): the
    # dense normal matrix cost is capacity-cubed, and the reference number
    # this races is for exactly 366 vertices
    builder = PoseGraphBuilder(max_nodes=384, max_edges=384, max_priors=8)
    est = [gt[0]]
    builder.add_se3_node(gt[0], fixed=True)
    for i in range(1, n):
        Z = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = rng.normal(0, 0.02, 6).astype(np.float32)
        Zn = np.asarray(se3_exp(jnp.asarray(noise))) @ Z
        est.append((est[-1] @ Zn).astype(np.float32))
        builder.add_se3_node(est[-1])
        builder.add_se3_edge(i - 1, i, Zn, noise=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01])
    builder.add_se3_edge(n - 1, 0, np.linalg.inv(gt[n - 1]) @ gt[0],
                         noise=[0.3, 0.3, 0.3, 0.01, 0.01, 0.01])

    cfg = GraphOptimizerConfig(max_iterations=50)
    graph = builder.to_graph()
    g_opt, stats = optimize_pose_graph(graph, cfg)  # compile + warmup
    jax.device_get(g_opt.poses)
    t0 = time.time()
    g_opt, stats = optimize_pose_graph(graph, cfg)
    stats = jax.device_get(stats)
    dt = time.time() - t0
    iters = int(stats["iterations"])
    _log(f"[pose_graph] {n} nodes/{n} edges: {dt*1000:.1f} ms, {iters} LM iters, "
         f"chi2 {float(stats['chi2_before']):.2f} -> {float(stats['chi2_after']):.5f}")
    assert float(stats["chi2_after"]) < float(stats["chi2_before"]) * 0.05

    # per-iteration rate measured over CHAINED solves: the axon transport
    # costs ~25-30 ms per dispatch+fetch round trip, which at 12 iterations
    # would masquerade as ~2.5 ms/iter of solver time. The reference's
    # 3.66 ms/iter is pure g2o compute (its own wall clock around optimize(),
    # g2o_graph_optimizer.cpp:38-52), so the honest comparison amortizes the
    # transport over several back-to-back solves in one program.
    reps = 8

    @jax.jit
    def chained(g):
        def one(tot, _):
            out, st = optimize_pose_graph(g, cfg)
            return tot + st["iterations"], out.poses[0, 0, 0]
        return jax.lax.scan(one, jnp.int32(0), None, length=reps)

    tot, _ = chained(graph)
    jax.device_get(tot)  # compile
    t0 = time.time()
    tot, _ = chained(graph)
    tot = int(jax.device_get(tot))
    dtc = time.time() - t0
    ms_per_iter = dtc * 1000.0 / max(tot, 1)
    _log(f"[pose_graph] chained x{reps}: {dtc*1000:.1f} ms, {tot} total iters "
         f"-> {ms_per_iter:.2f} ms/iter")

    # scaling point beyond the reference's case: 2048-node loop with the
    # matrix-free PCG solver (the dense 12288-dim Cholesky would pad out;
    # this is the path the distributed solve builds on)
    n2 = 2048
    b2 = PoseGraphBuilder(max_nodes=n2, max_edges=n2 + 8, max_priors=8)
    true2 = []
    for i in range(n2):
        th = 2 * np.pi * i / n2
        Ti = np.eye(4, dtype=np.float32)
        Ti[:3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        Ti[:3, 3] = [120 * np.cos(th), 120 * np.sin(th), 0.0]
        true2.append(Ti)
    est2 = [true2[0]]
    b2.add_se3_node(true2[0], fixed=True)
    for i in range(1, n2):
        Z = np.linalg.inv(true2[i - 1]) @ true2[i]
        noise = rng.normal(0, 0.02, 6).astype(np.float32)
        Zn = np.asarray(se3_exp(jnp.asarray(noise))) @ Z
        est2.append((est2[-1] @ Zn).astype(np.float32))
        b2.add_se3_node(est2[-1])
        b2.add_se3_edge(i - 1, i, Zn, noise=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01])
    # loop edge closes the drifted circle — this carries all the error
    b2.add_se3_edge(n2 - 1, 0, np.linalg.inv(true2[n2 - 1]) @ true2[0],
                    noise=[0.3, 0.3, 0.3, 0.01, 0.01, 0.01])
    cfg2 = GraphOptimizerConfig(max_iterations=30, solver="pcg")
    g2 = b2.to_graph()
    go2, st2 = optimize_pose_graph(g2, cfg2)
    jax.device_get(go2.poses)
    t0 = time.time()
    go2, st2 = optimize_pose_graph(g2, cfg2)
    st2 = jax.device_get(st2)
    dt2 = time.time() - t0
    it2 = int(st2["iterations"])
    _log(f"[pose_graph] 2048 nodes (PCG): {dt2*1000:.1f} ms, {it2} LM iters "
         f"({dt2*1000/max(it2,1):.1f} ms/iter), chi2 {float(st2['chi2_before']):.1f}"
         f" -> {float(st2['chi2_after']):.4f}")
    _emit("pose_graph_2048_ms_per_iter", dt2 * 1000.0 / max(it2, 1), "ms/iter",
          iterations=it2)
    return ms_per_iter, iters


def front_end_leg(workload):
    """Full production FrontEnd over consecutive frames (keyframes fire, the
    incremental map maintenance runs) -> (e2e fps, map-update ms)."""
    import jax

    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
    from lidar_slam_tpu.models.registration import NDTConfig
    from lidar_slam_tpu.pipeline.front_end import FrontEnd, FrontEndConfig

    cfg = FrontEndConfig(
        ndt=NDTConfig(
            resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
            max_iter=30, stencil="direct7", gather="auto", max_compact_voxels=65536,
            fused_window=512,  # A/B'd on-TPU (r5: per-group windows make
            # 512 exact even on the denser-than-bench stress world);
            # exactness asserted below
        ),
    )
    world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
    traj = make_trajectory(40, speed=0.8)  # KITTI-like ~0.8 m/frame at 10 Hz
    scans = []
    for i in range(18):
        pts, mask, _ = simulate_scan(
            world, traj[i], max_range=80.0, n_points=RAW_CAP, seed=3000 + i, noise=0.02
        )
        scans.append((pts, mask))

    fe = FrontEnd(cfg)
    fe.set_init_pose(traj[0])
    # preload = the CLI's prefetch-thread upload: frame i+1's pad + H2D
    # overlaps frame i's compute in production, so the e2e number measures
    # compute + map maintenance, not the container's tunnel bandwidth
    loaded = [fe.preload(p, m) for p, m in scans]
    # warmup: drives every jitted program (preprocess, coarse+fine align,
    # keyframe downsample, incremental map update) through compilation
    # warmup must reach a DEFERRED keyframe resolution (frame after the 2nd
    # keyframe) so the deferred-update dispatch compiles outside the timed
    # window
    t0 = time.time()
    for i in range(6):
        fe.update(None, preloaded=loaded[i])
    _log(f"[front_end] warmup/compiles: {time.time()-t0:.1f}s")

    t0 = time.time()
    n_kf0 = fe.n_keyframes
    errs = []
    for i in range(6, 18):
        pose, _ = fe.update(None, preloaded=loaded[i])
        errs.append(np.linalg.norm(pose[:3, 3] - traj[i][:3, 3]))
    dt = time.time() - t0
    fps = 12 / dt
    _log(f"[front_end] e2e {dt/12*1000:.1f} ms/frame ({fe.n_keyframes - n_kf0} "
         f"keyframes), err mean {np.mean(errs):.3f} m")
    assert np.mean(errs) < 0.15, f"front-end e2e error guard ({np.mean(errs):.3f} m)"

    # device-resident drive: the same e2e work (preprocess + coarse-to-fine
    # align + cond-gated keyframe/map maintenance) scan-chained into ONE
    # program — removes the per-frame transport round trip and host branching
    from lidar_slam_tpu.pipeline.front_end import front_end_drive, init_front_end_drive
    import jax.numpy as jnp

    pts_seq = jnp.stack([l[0] for l in loaded[3:18]])
    msk_seq = jnp.stack([l[1] for l in loaded[3:18]])
    st = init_front_end_drive(cfg, init_pose=traj[0])
    warm2 = [l for l in loaded[:3]]
    st, _, _, _ = front_end_drive(
        st, jnp.stack([w[0] for w in warm2] + [warm2[0][0]] * 12),
        jnp.stack([w[1] for w in warm2] + [warm2[0][1]] * 12), cfg
    )
    # state init is setup (one-time, host-side empty-grid finalize +
    # transfers), not per-frame work: keep it out of the timed region, and
    # take the best of 2 reps (the tunnel adds 10-20% run-to-run jitter)
    st2 = init_front_end_drive(cfg, init_pose=traj[3])
    dtd = float("inf")
    for _ in range(2):
        t0 = time.time()
        _, dposes, dkfs, dunres = front_end_drive(st2, pts_seq, msk_seq, cfg)
        dposes = jax.device_get(dposes)
        dtd = min(dtd, time.time() - t0)
    # the chained leg restarts from an empty map at frame 3's pose; skip the
    # re-initialization transient in the error guard
    errs_d = [np.linalg.norm(dposes[k][:3, 3] - traj[3 + k][:3, 3]) for k in range(3, 15)]
    drive_fps = 15 / dtd
    _log(f"[front_end] drive {dtd/15*1000:.1f} ms/frame (scan-chained, "
         f"{int(np.asarray(dkfs).sum())} keyframes), err mean {np.mean(errs_d):.3f} m, "
         f"unresolved max {float(np.asarray(dunres).max())}")
    assert float(np.asarray(dunres).max()) == 0.0
    assert np.mean(errs_d) < 0.15, f"front-end drive error guard ({np.mean(errs_d):.3f} m)"

    # isolated incremental map-update latency (warm): evict+scatter+refinalize
    from lidar_slam_tpu.pipeline.front_end import _incremental_map_update
    import jax.numpy as jnp

    from lidar_slam_tpu.pipeline.front_end import coarse_tracking_cfg

    slot = (fe.kf_cursor - 1) % cfg.local_frame_num
    origin_kf = jnp.asarray(
        fe._lattice_origin(np.asarray(fe.kf_poses[slot])[:3, 3], cfg.ndt, snap_mult=2.0)
    )
    args = (
        fe.fine_sums, fe.coarse_sums, fe.kf_world[slot],
        fe.kf_masks[slot], fe.kf_weights[slot],
        fe.kf_points[slot], fe.kf_masks[slot], fe.kf_weights[slot],
        fe.kf_poses[slot],
        origin_kf,
        origin_kf,
    )
    # production map configs: tracking maps skip the dense stats views
    fine_cfg = dataclasses.replace(cfg.ndt, dense_stats=False)
    coarse_cfg = coarse_tracking_cfg(cfg.ndt)
    out = _incremental_map_update(*args, fine_cfg, coarse_cfg)
    jax.device_get(out[3].origin)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = _incremental_map_update(*args, fine_cfg, coarse_cfg)
    jax.device_get(out[3].origin)
    upd_ms = (time.time() - t0) / reps * 1000.0
    _log(f"[front_end] incremental map update: {upd_ms:.1f} ms/keyframe (fine+coarse)")
    return fps, upd_ms, drive_fps


def aloam_leg():
    """A-LOAM pipeline fps on synthetic spinning scans — the FUSED one-
    dispatch-per-sweep step (features -> odometry -> mapping -> map fold in
    one program; the reference's real-time budget is <100 ms/stage,
    scanRegistration.cpp:454)."""
    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_spinning_scan
    from lidar_slam_tpu.pipeline.aloam import AloamPipeline, FeatureExtractionConfig

    fe_cfg = FeatureExtractionConfig(
        n_scans=64, min_range=2.5, capacity=65536,
        max_sharp=1024, max_less_sharp=8192, max_flat=2048, max_less_flat=16384,
    )
    pipe = AloamPipeline(fe_cfg)
    world = SyntheticWorld.corridor(length=60.0, width=18.0, density=30.0, seed=2)
    traj = make_trajectory(12, speed=0.8)
    pipe.set_init_pose(traj[0])
    frames = []
    for i in range(12):
        pts, mask = simulate_spinning_scan(
            world, traj[i], t=i * 0.1, n_scans=64, n_azimuth=1024, seed=i
        )
        frames.append((pts, mask))

    t0 = time.time()
    for i in range(2):  # state prime (per-frame step)
        pipe.update(*frames[i])
    state_primed = pipe.state
    pipe.update_batch(frames[2:])  # compile the T=10 chained program
    pipe.state = state_primed  # rewind: measure the warm chained run
    _log(f"[aloam] warmup/compiles: {time.time()-t0:.1f}s")
    t0 = time.time()
    poses = pipe.update_batch(frames[2:])
    dt = time.time() - t0
    errs = [np.linalg.norm(poses[i][:3, 3] - traj[2 + i][:3, 3]) for i in range(10)]
    _log(f"[aloam] {dt/10*1000:.1f} ms/frame (scan-chained), err mean {np.mean(errs):.3f} m")
    assert np.mean(errs) < 0.3, f"A-LOAM error guard ({np.mean(errs):.3f} m)"
    return 10 / dt


def eval_probe(cfg, workload):
    """Pure derivative-evaluation time: 20 evals chained in ONE program
    (serial dependency through the pose). Separates the kernel from the
    per-frame preprocess/sort/align-control costs that dominate the frame
    number — and from the ~0.9 ms/dispatch transport overhead that made the
    round-4 per-eval numbers 3x too pessimistic."""
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.models.registration import build_ndt_map, ndt_derivatives
    from lidar_slam_tpu.models.registration.ndt import sort_points_by_vid
    from lidar_slam_tpu.ops import PointCloud, finite_mask, voxel_downsample

    map_cloud, all_pts, all_msk, gt, guess0 = workload
    ndt_map = build_ndt_map(map_cloud, cfg)
    m = all_msk[0] & finite_mask(all_pts[0])
    cloud = PointCloud(points=jnp.where(m[:, None], all_pts[0], 0.0), mask=m)
    frame = voxel_downsample(cloud, 0.5, out_capacity=FRAME_CAP)
    pts, msk, w = sort_points_by_vid(
        ndt_map, frame.points, frame.mask, frame.get_weights(), guess0
    )
    pose6 = jnp.zeros(6).at[:3].set(jnp.asarray(guess0)[:3, 3])
    reps = 20

    @jax.jit
    def chained(mm, p, k, g):
        def body(carry, _):
            pose, acc = carry
            sc, gr, he, un = ndt_derivatives(
                mm, p, k, pose, cfg, True, return_unresolved=True
            )
            return (pose + 1e-9 * sc * jnp.ones(6, jnp.float32), acc + sc + un), None
        (pose, acc), _ = jax.lax.scan(body, (g, jnp.float32(0.0)), None, length=reps)
        return acc

    out = chained(ndt_map, pts, msk, pose6)
    jax.device_get(out)
    t0 = time.time()
    for _ in range(3):
        out = chained(ndt_map, pts, msk, pose6)
    jax.device_get(out)
    return (time.time() - t0) / 3 / reps * 1000.0


def mfu_roofline(cfg, fps, iters_mean, n_slots, eval_ms):
    """Analytic FLOP/byte accounting for the fused NDT kernel + an MFU metric.

    Counts the per-(point, stencil-slot) work of one derivative evaluation
    (the hot loop the reference runs per point x radius-neighbour,
    NormalDistributionsTransform.cpp:391-445):

      - one-hot selection contraction  [16, W] @ [W, T]: 2*16*W FLOP/point
        (MXU) plus ~2*W compare/convert ops building the one-hot mask (VPU);
      - Magnusson score/grad/Hessian math: ~300 FLOP/point (VPU).

    `eval_ms` is the DIRECTLY MEASURED chained evaluation time (eval_probe)
    — round 4 divided the whole frame time by the eval count, which folded
    preprocess/sort/align control into "eval time" and understated the
    kernel. The frame split (evals vs other) is logged alongside. HBM
    traffic per evaluation is the packed per-point rows (31 f32 + 3 i32);
    keys/table stay VMEM-resident.

    Peaks: TPU v5e ~197 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU, ~819 GB/s HBM.
    """
    n = FRAME_CAP
    w = cfg.fused_window
    evals = iters_mean + 1.0
    mxu_flops = 2.0 * 16 * w * n * n_slots  # selection contraction
    vpu_ops = (2.0 * w + 300.0) * n * n_slots  # one-hot build + derivative math
    hbm_bytes = n * (31 * 4 + 3 * 4)
    peak_f32 = 49.2e12
    mfu = (mxu_flops / (eval_ms / 1000.0)) / peak_f32
    # time lower bounds at peak
    t_mxu = mxu_flops / peak_f32 * 1e3
    t_vpu = vpu_ops / 4.0e12 * 1e3
    t_hbm = hbm_bytes / 819e9 * 1e3
    ms_frame = 1000.0 / fps
    _log(
        f"[roofline] per eval: {mxu_flops/1e9:.2f} GFLOP MXU (selection), "
        f"{vpu_ops/1e9:.2f} Gop VPU, {hbm_bytes/1e6:.1f} MB HBM -> lower bounds "
        f"{t_mxu:.2f} / {t_vpu:.2f} / {t_hbm:.3f} ms; measured {eval_ms:.2f} ms/eval "
        f"(chained), frame {ms_frame:.1f} ms = {evals:.1f} evals "
        f"({evals*eval_ms:.1f} ms) + {ms_frame - evals*eval_ms:.1f} ms "
        f"preprocess/sort/align-control. "
        f"HBM {100*t_hbm/max(eval_ms,1e-9):.1f}% of eval; "
        f"MXU f32 utilization {mfu*100:.1f}% of eval time"
    )
    _emit("ndt_mfu", mfu, "fraction_f32_peak",
          eval_ms=round(eval_ms, 3),
          gflop_per_eval=round(mxu_flops / 1e9, 2),
          frame_other_ms=round(ms_frame - evals * eval_ms, 2))


def _loop_graph(n, radius, seed=0):
    """Noisy circular odometry chain + one loop edge at capacity n."""
    import jax.numpy as jnp

    from lidar_slam_tpu.geom import se3_exp
    from lidar_slam_tpu.models.graph_optimizer import PoseGraphBuilder

    rng = np.random.default_rng(seed)
    b = PoseGraphBuilder(max_nodes=n, max_edges=n + 8, max_priors=8)
    true_p = []
    for i in range(n):
        th = 2 * np.pi * i / n
        Ti = np.eye(4, dtype=np.float32)
        Ti[:3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        Ti[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0.0]
        true_p.append(Ti)
    est = [true_p[0]]
    b.add_se3_node(true_p[0], fixed=True)
    for i in range(1, n):
        Z = np.linalg.inv(true_p[i - 1]) @ true_p[i]
        noise = rng.normal(0, 0.02, 6).astype(np.float32)
        Zn = np.asarray(se3_exp(jnp.asarray(noise))) @ Z
        est.append((est[-1] @ Zn).astype(np.float32))
        b.add_se3_node(est[-1])
        b.add_se3_edge(i - 1, i, Zn, noise=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01])
    b.add_se3_edge(n - 1, 0, np.linalg.inv(true_p[n - 1]) @ true_p[0],
                   noise=[0.3, 0.3, 0.3, 0.01, 0.01, 0.01])
    return b


def pose_graph_solver_sweep():
    """On-device solver scaling study (round-4 verdict item 7): dense MXU
    Cholesky vs matrix-free PCG at 512 / 2048 / 8192 nodes, plus the Schur
    two-level program on a 1-device mesh (its multi-block form is exercised
    at parity on the CPU mesh; single-chip it degenerates to one interior
    block — the data shows why Schur is a DISTRIBUTED-memory play, not a
    single-chip one). Emits pose_graph_schur_ms_per_iter and the per-size
    dense/pcg ms/iter that justify GraphOptimizerConfig.dense_limit."""
    import jax
    from lidar_slam_tpu.models.graph_optimizer import (
        GraphOptimizerConfig,
        optimize_pose_graph,
    )

    def time_solve(graph, cfg):
        g_opt, stats = optimize_pose_graph(graph, cfg)
        jax.device_get(g_opt.poses)  # compile
        t0 = time.time()
        g_opt, stats = optimize_pose_graph(graph, cfg)
        stats = jax.device_get(stats)
        dt = time.time() - t0
        it = max(int(stats["iterations"]), 1)
        assert float(stats["chi2_after"]) < float(stats["chi2_before"])
        return dt * 1000.0 / it, it

    results = {}
    for n, radius in ((512, 80.0), (2048, 120.0), (8192, 200.0)):
        b = _loop_graph(n, radius, seed=n)
        graph = b.to_graph()
        pcg_ms, pcg_it = time_solve(graph, GraphOptimizerConfig(max_iterations=20, solver="pcg"))
        results[(n, "pcg")] = pcg_ms
        line = f"[solver_sweep] n={n}: pcg {pcg_ms:.2f} ms/iter ({pcg_it} iters)"
        if n <= 1024:
            # dense Cholesky: [6n, 6n] normal matrix — pads out beyond ~2k
            dense_ms, dense_it = time_solve(
                graph, GraphOptimizerConfig(max_iterations=20, solver="dense")
            )
            results[(n, "dense")] = dense_ms
            line += f", dense {dense_ms:.2f} ms/iter ({dense_it} iters)"
        _log(line)

    # the Schur PROGRAM on the device (1-block degenerate form at 512 nodes;
    # multi-block parity lives on the CPU mesh, tests/test_parallel.py)
    try:
        from lidar_slam_tpu.models.graph_optimizer import GraphOptimizerConfig as GC
        from lidar_slam_tpu.parallel import make_mesh, optimize_pose_graph_schur, schur_prepare

        b = _loop_graph(512, 80.0, seed=7)
        sg = schur_prepare(b.to_graph(), n_devices=1, sep_cap=16)
        mesh1 = make_mesh(1)
        cfgs = GC(max_iterations=20)
        g_s, st_s = optimize_pose_graph_schur(sg, cfgs, mesh1)
        jax.device_get(g_s.poses)
        t0 = time.time()
        g_s, st_s = optimize_pose_graph_schur(sg, cfgs, mesh1)
        st_s = jax.device_get(st_s)
        dt = time.time() - t0
        it_s = max(int(st_s["iterations"]), 1)
        schur_ms = dt * 1000.0 / it_s
        _log(f"[solver_sweep] schur(1 block) n=512: {schur_ms:.2f} ms/iter ({it_s} iters)")
        _emit("pose_graph_schur_ms_per_iter", schur_ms, "ms/iter", nodes=512,
              note="single-chip 1-block form; multi-block parity on CPU mesh")
    except Exception as e:
        _log(f"[solver_sweep] schur leg FAILED: {e}")

    _emit("pose_graph_8192_ms_per_iter", results[(8192, "pcg")], "ms/iter", solver="pcg")
    return results


def sc_growth_leg():
    """Scan Context retrieval cost vs stored-descriptor count (round-4
    verdict item 8; scan_context.cpp:251-348 scaling intent). KITTI-0027
    scale is ~800 keyframes; a city-scale map is thousands."""
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.models.scan_context import (
        ScanContextConfig,
        detect_loop,
        ring_key,
    )

    sccfg = ScanContextConfig()
    rng = np.random.default_rng(0)
    out = {}
    for hist in (200, 800, 3200):
        descs = jnp.asarray(
            rng.uniform(0, 8, (hist, sccfg.num_rings, sccfg.num_sectors)).astype(np.float32)
        )
        rks = jax.vmap(ring_key)(descs)
        valid = jnp.arange(hist) < hist - 50
        f = jax.jit(lambda q, qr, d, r, m: detect_loop(q, qr, d, r, m, sccfg))
        o = f(descs[-1], rks[-1], descs, rks, valid)
        jax.device_get(o[0])
        t0 = time.time()
        for _ in range(10):
            o = f(descs[-1], rks[-1], descs, rks, valid)
        jax.device_get(o[0])
        out[hist] = (time.time() - t0) / 10 * 1000.0
    _log(f"[sc_growth] detect ms at 200/800/3200 descriptors: "
         f"{out[200]:.1f} / {out[800]:.1f} / {out[3200]:.1f}")
    _emit("sc_detect_ms_800", out[800], "ms",
          ms_200=round(out[200], 2), ms_3200=round(out[3200], 2))
    return out


def matching_leg():
    """Steady-state map-matching localization (Matching::Update,
    matching.cpp:185-265): ground-seg + voxel filter + coarse-to-fine NDT
    against a box-cropped prebuilt map, full production path per frame."""
    from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_spinning_scan
    from lidar_slam_tpu.pipeline.matching import Matching, MatchingConfig

    world = SyntheticWorld.corridor(length=120.0, width=18.0, density=30.0, seed=5)
    traj = make_trajectory(16, speed=1.0)
    frames = [
        simulate_spinning_scan(world, traj[i], t=i * 0.1, n_scans=64, n_azimuth=2048, seed=700 + i)
        for i in range(16)
    ]
    # the world surface stands in for the viewer's filtered_map.pcd
    m = Matching(MatchingConfig(), world.points)
    m.set_gnss_pose(traj[0])

    # preload = the CLI prefetch thread's pad + H2D upload (overlaps compute
    # in production; same protocol as the front-end leg)
    loaded = [m.preload(*frames[i]) for i in range(16)]
    t0 = time.time()
    for i in range(3):  # warmup / compile
        m.update(None, preloaded=loaded[i])
    _log(f"[matching] warmup/compiles: {time.time()-t0:.1f}s")
    t0 = time.time()
    poses = [m.update(None, preloaded=loaded[i]) for i in range(3, 16)]
    dt = time.time() - t0
    errs = [np.linalg.norm(poses[k][:3, 3] - traj[3 + k][:3, 3]) for k in range(13)]
    _log(f"[matching] {dt/13*1000:.1f} ms/frame, err mean {np.mean(errs):.3f} m")
    assert np.mean(errs) < 0.3, f"matching error guard ({np.mean(errs):.3f} m)"

    # scan-chained drive: same work, no per-frame host round trip (valid
    # between local-map refreshes — ~100 m of travel per chunk at the 200 m
    # box / 50 m margin operating point)
    import jax
    import jax.numpy as jnp
    from lidar_slam_tpu.pipeline.matching import matching_drive

    pts_seq = jnp.stack([loaded[i][0] for i in range(3, 16)])
    msk_seq = jnp.stack([loaded[i][1] for i in range(3, 16)])
    mcfg = m.cfg
    coarse_cfg = m._coarse_cfg() if mcfg.coarse_to_fine else None
    init = jnp.asarray(np.asarray(traj[3], np.float32))
    dposes, dunres = matching_drive(
        m.ndt_map, m.coarse_ndt_map, pts_seq, msk_seq, init, mcfg, coarse_cfg
    )
    jax.device_get(dposes)  # warm
    dtd = float("inf")
    for _ in range(2):
        t0 = time.time()
        dposes, dunres = matching_drive(
            m.ndt_map, m.coarse_ndt_map, pts_seq, msk_seq, init, mcfg, coarse_cfg
        )
        dposes = jax.device_get(dposes)
        dtd = min(dtd, time.time() - t0)
    errs_d = [np.linalg.norm(dposes[k][:3, 3] - traj[3 + k][:3, 3]) for k in range(13)]
    assert float(np.asarray(dunres).max()) == 0.0
    assert np.mean(errs_d) < 0.3, f"matching drive error guard ({np.mean(errs_d):.3f} m)"
    _log(f"[matching] drive {dtd/13*1000:.1f} ms/frame (scan-chained), "
         f"err mean {np.mean(errs_d):.3f} m")
    _emit("matching_drive_fps", 13 / dtd, "frames/s", vs_baseline=13 / dtd / 10.0)

    # OnlyPosition 270-yaw initialization (getInitialYawAngle,
    # matching.cpp:267-308 — SURVEY §3.4 HOT; init-time only in production)
    from lidar_slam_tpu.ops.pointcloud import PointCloud as _PC, voxel_downsample as _vd

    pj, mj = loaded[3]
    m._pending_scan = _vd(
        _PC(points=pj, mask=mj), m.cfg.frame_leaf, out_capacity=m.cfg.frame_capacity
    )
    pos3 = np.asarray(traj[3][:3, 3], np.float32)
    m._initial_yaw(pos3)  # compile
    t0 = time.time()
    for _ in range(5):
        yaw0 = m._initial_yaw(pos3)  # float() inside forces the fence
    init_ms = (time.time() - t0) / 5 * 1000.0
    _log(f"[matching] yaw init (270-sample grid search): {init_ms:.1f} ms, yaw {yaw0:.3f}")
    _emit("matching_init_ms", init_ms, "ms")

    # ResetLocalMap refresh stall (matching.cpp:254-262): host box-crop of
    # the global map + voxel filter + fine/coarse NDT map rebuild. Amortized
    # in production over box_size/2 - margin of travel per refresh.
    import jax as _jax

    t0 = time.time()
    for _ in range(3):
        m.reset_local_map(pos3)
        _jax.device_get(m.ndt_map.keys[0])
    refresh_ms = (time.time() - t0) / 3 * 1000.0
    travel = m.cfg.box_size / 2.0 - m.cfg.refresh_margin
    _log(f"[matching] local-map refresh: {refresh_ms:.1f} ms "
         f"(every {travel:.0f} m of travel -> {refresh_ms/max(travel,1e-9):.2f} ms/frame at 1 m/frame)")
    _emit("matching_refresh_ms", refresh_ms, "ms",
          amortized_ms_per_frame=round(refresh_ms / max(travel, 1e-9), 2))
    return 13 / dt


def loop_verify_leg():
    """Loop-closing hot path: SC retrieval + submap NDT verification
    (loop_closing.cpp:202-319). Returns (detect_ms, verify_ms)."""
    import tempfile

    from lidar_slam_tpu.io import SyntheticWorld, make_hairpin_trajectory, simulate_scan
    from lidar_slam_tpu.io.keyframe_store import KeyframeStore
    from lidar_slam_tpu.pipeline.loop_closing import LoopClosing, LoopClosingConfig

    world = SyntheticWorld.corridor(length=60.0, width=16.0, density=30.0, seed=9)
    gt = make_hairpin_trajectory(n_out=14, n_turn=16, n_back=12, speed=1.0, turn_radius=1.0)
    with tempfile.TemporaryDirectory() as root:
        store = KeyframeStore(root)
        # short 42-keyframe drive: scale the SC exclude-recent window to the
        # leg's diff_num (the production default 50 — reference-exact,
        # scan_context.h:100 — would exclude the entire history here)
        from lidar_slam_tpu.models.scan_context import ScanContextConfig

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
            if loop is not None and detected is None:
                detected = (loop.index0, loop.index1)
        assert detected is not None, "loop_verify_leg: no loop detected on the hairpin"

        # steady-state retrieval + verification on the detected pair
        idx0, idx1 = detected
        t0 = time.time()
        for _ in range(5):
            lc.sc.detect()
        detect_ms = (time.time() - t0) / 5 * 1000.0
        lc._verify(idx0, idx1, 0.0)  # warm
        t0 = time.time()
        for _ in range(5):
            out = lc._verify(idx0, idx1, 0.0)
        verify_ms = (time.time() - t0) / 5 * 1000.0
        assert out is not None, "loop_verify_leg: verification rejected a true loop"
        _log(f"[loop] sc retrieval {detect_ms:.1f} ms, submap NDT verify {verify_ms:.1f} ms "
             f"(pair {idx0}->{idx1}, fitness {out.fitness:.3f})")
    return detect_ms, verify_ms


def cpu_mode():
    """Subprocess leg: the identical scan-match workload on XLA CPU with the
    exact two_level gather — the measured CPU baseline."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lidar_slam_tpu.models.registration import NDTConfig

    cfg = NDTConfig(
        resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=30,
        stencil="direct7", gather="two_level", max_compact_voxels=65536,
    )
    workload = build_workload()
    fps, _ = scan_match_leg("cpu two_level", cfg, workload)
    _emit("ndt_cpu_fps", fps, "frames/s")
    # reference-exact radiusSearch semantics (VoxelGrid.cpp:432-480): the
    # 27-stencil leg, so the TPU radius27 number has a same-semantics baseline
    fps27, _ = scan_match_leg(
        "cpu radius27 two_level", dataclasses.replace(cfg, stencil="radius27"), workload
    )
    _emit("ndt_cpu_fps_radius27", fps27, "frames/s")
    return 0


def main():
    if os.environ.get("BENCH_MODE") == "cpu":
        return cpu_mode()

    from lidar_slam_tpu.utils import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    import jax

    _log(f"devices: {jax.devices()}")
    _log(f"compilation cache: {cache_dir or 'disabled'}")

    # CPU baseline runs concurrently in its own process (XLA CPU does not
    # contend with the TPU legs)
    env = dict(os.environ)
    env["BENCH_MODE"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    cpu_proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )

    stencil = os.environ.get("NDT_STENCIL", "direct7")
    gather = os.environ.get("NDT_GATHER", "fused")
    max_iter = int(os.environ.get("NDT_MAX_ITER", "30"))
    from lidar_slam_tpu.models.registration import NDTConfig

    cfg = NDTConfig(
        resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, max_iter=max_iter,
        stencil=stencil, gather=gather,
        max_compact_voxels=int(os.environ.get("NDT_MAX_COMPACT", "65536")),
        # key window sized by on-TPU A/B (W=1024: -20% eval time, unresolved
        # stays 0 at this operating point; the parity gate + unresolved
        # asserts below fail loudly if a denser workload ever needs more)
        fused_window=int(os.environ.get("NDT_FUSED_WINDOW", "512")),
    )
    workload = build_workload()

    # headline measured first (it matters most if anything downstream dies);
    # its JSON line still prints LAST
    fps_tpu, iters_mean = scan_match_leg(f"tpu {stencil} {gather}", cfg, workload)
    derivative_parity_gate(cfg, workload)
    eval_ms = eval_probe(cfg, workload)
    mfu_roofline(cfg, fps_tpu, iters_mean,
                 n_slots=7 if stencil == "direct7" else 27, eval_ms=eval_ms)

    fps_r27, _ = scan_match_leg(
        "tpu radius27 fused", dataclasses.replace(cfg, stencil="radius27"), workload
    )

    ms_per_iter, g_iters = pose_graph_leg()
    # reference laptop log: 3.66 ms/iter at the same node/edge count
    _emit("pose_graph_ms_per_iter", ms_per_iter, "ms/iter",
          vs_baseline=3.66 / ms_per_iter, iterations=g_iters)
    try:
        pose_graph_solver_sweep()
    except Exception as e:
        _log(f"[solver_sweep] FAILED: {e}")
    try:
        sc_growth_leg()
    except Exception as e:
        _log(f"[sc_growth] FAILED: {e}")

    try:
        aloam_fps = aloam_leg()
        _emit("aloam_pipeline_fps", aloam_fps, "frames/s", vs_baseline=aloam_fps / 10.0)
    except Exception as e:  # the headline must still print
        _log(f"[aloam] FAILED: {e}")

    e2e_fps, upd_ms, drive_fps = front_end_leg(workload)
    _emit("map_update_ms", upd_ms, "ms/keyframe")
    _emit("front_end_e2e_fps", e2e_fps, "frames/s", vs_baseline=e2e_fps / 10.0)
    _emit("front_end_drive_fps", drive_fps, "frames/s", vs_baseline=drive_fps / 10.0)

    try:
        match_fps = matching_leg()
        _emit("matching_fps", match_fps, "frames/s", vs_baseline=match_fps / 10.0)
    except Exception as e:
        _log(f"[matching] FAILED: {e}")
    try:
        detect_ms, verify_ms = loop_verify_leg()
        # budget: the reference's generic 100 ms real-time stage warn
        _emit("loop_verify_ms", detect_ms + verify_ms, "ms",
              vs_baseline=100.0 / max(detect_ms + verify_ms, 1e-9),
              sc_detect_ms=round(detect_ms, 3), ndt_verify_ms=round(verify_ms, 3))
    except Exception as e:
        _log(f"[loop] FAILED: {e}")

    out, _ = cpu_proc.communicate(timeout=3600)
    cpu_fps = cpu_fps27 = None
    for line in out.splitlines():
        try:
            rec = json.loads(line)
            if rec.get("metric") == "ndt_cpu_fps":
                cpu_fps = rec["value"]
            elif rec.get("metric") == "ndt_cpu_fps_radius27":
                cpu_fps27 = rec["value"]
        except (json.JSONDecodeError, TypeError):
            continue

    if cpu_fps27:
        _emit("ndt_cpu_fps_radius27", cpu_fps27, "frames/s")
        _log(f"radius27 TPU/CPU speedup: {fps_r27/cpu_fps27:.2f}x at reference "
             f"radiusSearch semantics (target >= 5x)")
        _emit("ndt_scan_match_fps_radius27", fps_r27, "frames/s",
              vs_baseline=fps_r27 / cpu_fps27, baseline="cpu")
    else:
        _log("WARNING: CPU radius27 leg missing — vs_baseline is fps/10Hz, NOT x-CPU")
        _emit("ndt_scan_match_fps_radius27", fps_r27, "frames/s",
              vs_baseline=fps_r27 / 10.0, baseline="realtime_10hz")

    if cpu_fps:
        _emit("ndt_cpu_fps", cpu_fps, "frames/s")
        _log(f"TPU/CPU speedup: {fps_tpu/cpu_fps:.2f}x (target >= 5x)")
        _emit("ndt_scan_match_fps", fps_tpu, "frames/s",
              vs_baseline=fps_tpu / cpu_fps, baseline="cpu")
    else:
        # the CPU subprocess died: fall back to real-time multiples but SAY SO
        # (a 'x CPU' and a 'x 10 Hz' number must never be confusable)
        _log("WARNING: CPU baseline leg missing — vs_baseline is fps/10Hz, NOT x-CPU")
        _emit("ndt_scan_match_fps", fps_tpu, "frames/s",
              vs_baseline=fps_tpu / 10.0, baseline="realtime_10hz")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Command-line entry points — the L6 launch layer.

Replaces the reference's roslaunch files + rosservice calls
(launch/mapping.launch, matching.launch, /save_map, /optimize_map) with
plain subcommands over the same pipeline:

  python -m lidar_slam_tpu mapping --kitti-raw <drive_dir> --out slam_data
  python -m lidar_slam_tpu mapping --synthetic 60 --out slam_data
  python -m lidar_slam_tpu matching --map slam_data --kitti-raw <drive_dir>
  python -m lidar_slam_tpu bench

Where the reference triggers map save / optimization via ROS services, these
run automatically at the end of a mapping session (and `BackEnd.force_optimize`
/ `Viewer.save_map` remain callable from the API).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _prefetch(iterable, depth: int = 4):
    """Run a frame source on a background thread with a bounded queue — the
    TPU-native form of the reference's cross-process stage overlap
    (launch/mapping.launch runs data_pretreat and front_end as separate ROS
    nodes): disk reads, decode, and numpy padding for frame i+1 happen while
    the device computes frame i. JAX's async dispatch overlaps the device
    side; this thread overlaps the host side."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    _END = object()
    err = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            break
        yield item


def _run_mapping(args) -> int:
    import json

    from .config import load_config
    from .io.keyframe_store import KeyframeStore
    from .io.trajectory import write_kitti_trajectory, ate_rmse
    from .pipeline import BackEnd, FrontEnd, LoopClosing, Viewer
    from .utils.watchdog import RunHealth

    cfg = load_config(args.config)
    resume = bool(getattr(args, "resume", False))
    store = KeyframeStore(args.out, resume=resume)
    mesh = None
    n_mesh = int(getattr(args, "mesh_devices", 0) or 0)
    if n_mesh > 1:
        # multi-chip mapping: point-shard the per-frame NDT reductions over
        # a device mesh (parallel/sharded_ndt.py); map maintenance runs
        # replicated. Trajectory-equal to single-device
        # (tests/test_parallel.py::TestShardedPipeline).
        from .parallel import make_mesh

        mesh = make_mesh(n_mesh)
    if getattr(args, "front_end", "ndt") == "aloam":
        fe = _AloamFrontEnd(capacity=65536 if getattr(args, "synthetic", None) else 131072)
    else:
        fe = FrontEnd(cfg.front_end, mesh=mesh)
    be = BackEnd(cfg.back_end, store=store)
    lc = LoopClosing(cfg.loop_closing, store=store, data_path=args.out)
    viewer = Viewer(cfg.viewer, store)
    health = RunHealth()

    # --- session resume (SURVEY §5.3/§5.4): rebuild tracking + graph state
    # from the store and continue where the interrupted run stopped
    est = []
    skip_frames = 0
    progress = store.load_progress() if resume else None
    if progress is not None and len(store) > 0:
        # stored keyframe poses are map-frame (GNSS re-anchored); the front
        # end tracks in its own odometry frame and the live trajectory is
        # written in that frame — restore both frames consistently
        o2m = progress.get("odom_to_map")
        M = np.eye(4, dtype=np.float32) if o2m is None else np.asarray(o2m, np.float32)
        Minv = np.linalg.inv(M).astype(np.float32)
        n_kf = be.restore_from_store(store, odom_to_map=M)
        # replaying LoopClosing over the stored keyframes rebuilds SC state
        # and re-detects the loops the original run found
        for k in range(n_kf):
            rec = store.load(k)
            loop = lc.update(k, rec["pose"], gnss_position=rec.get("gnss"))
            if loop is not None:
                be.insert_loop_pose(loop.index0, loop.index1, loop.relative_pose)
            viewer.update_with_new_key_frame(k, rec["pose"])
        if hasattr(fe, "restore"):
            local_n = getattr(cfg.front_end, "local_frame_num", 20)
            kfs = []
            for k in range(max(0, n_kf - local_n), n_kf):
                rec = store.load(k)
                rec["pose"] = (Minv @ np.asarray(rec["pose"], np.float32)).astype(np.float32)
                kfs.append(rec)
            fe.restore(
                kfs,
                total_keyframes=n_kf,
                last_pose=np.asarray(progress["last_pose"], np.float32),
                predict_pose=np.asarray(progress["predict_pose"], np.float32),
            )
        skip_frames = int(progress["frames_done"])
        live = f"{store.traj_dir}/laser_odom_live.txt"
        if os.path.exists(live):
            from .io.trajectory import read_kitti_trajectory

            est = list(read_kitti_trajectory(live))[:skip_frames]
        print(f"resumed: {n_kf} keyframes, {skip_frames} frames already done")

    def _stage(source):
        # device upload happens on the prefetch thread: frame i+1's H2D
        # overlaps frame i's compute (see FrontEnd.preload)
        for frame in source:
            if hasattr(fe, "preload"):
                frame["preloaded"] = fe.preload(frame["points"])
            yield frame

    def _skipping(source):
        for i, frame in enumerate(source):
            if i < skip_frames:
                continue
            yield i, frame

    frames = _prefetch(_stage(_frame_source(args)))
    gt = []
    live_path = f"{store.traj_dir}/laser_odom_live.txt"
    if skip_frames == 0:
        open(live_path, "w").close()
    t_start = time.time()
    for i, frame in _skipping(frames):
        with health.stage("front_end"):
            pose, _ = fe.update(
                frame["points"], bboxes=frame.get("bboxes"),
                preloaded=frame.get("preloaded"),
            )
        health.frame(pose)
        est.append(pose)
        if frame.get("gt_pose") is not None:
            gt.append(frame["gt_pose"])
        gnss = frame.get("gnss_position")
        pts = frame["points"]
        with health.stage("back_end"):
            new_kf = be.update(
                pose,
                time=frame.get("time", i * 0.1),
                gnss_position=gnss,
                gnss_pose=frame.get("gnss_pose"),
                cloud_points=pts[: len(pts)],
                cloud_mask=np.ones(len(pts), bool),
            )
        if new_kf:
            kf = be.latest_keyframe()
            viewer.update_with_new_key_frame(kf.index, kf.pose)
            with health.stage("loop_closing", budget_ms=500.0):
                loop = lc.update(kf.index, kf.pose, gnss_position=gnss)
            if loop is not None:
                print(f"loop closure: {loop.index0} <- {loop.index1}")
                be.insert_loop_pose(loop.index0, loop.index1, loop.relative_pose)
            if be.has_new_optimized():
                viewer.update_with_optimized_poses(be.get_optimized_poses())
        with open(live_path, "a") as f:
            f.write(" ".join(f"{v:.9g}" for v in np.asarray(pose, np.float32)[:3, :].reshape(-1)) + "\n")
        o2m = getattr(be, "_odom_to_map", None)
        store.save_progress({
            "frames_done": i + 1,
            "last_pose": np.asarray(pose, np.float32).tolist(),
            "predict_pose": np.asarray(
                getattr(fe, "predict_pose", pose), np.float32
            ).tolist(),
            "odom_to_map": None if o2m is None else np.asarray(o2m, np.float32).tolist(),
        })
        if i % 20 == 0:
            print(f"frame {i}: pose {np.asarray(pose)[:3, 3]}")

    stats = be.force_optimize()
    if be.get_optimized_poses() is not None:
        viewer.update_with_optimized_poses(be.optimized_poses)
    out = viewer.save_map()
    write_kitti_trajectory(f"{store.traj_dir}/laser_odom.txt", np.stack(est))
    dt = time.time() - t_start
    print(f"mapping done: {len(est)} frames in {dt:.1f}s ({len(est)/dt:.2f} fps), "
          f"{len(be.key_frames)} keyframes, {len(lc.detected)} loops, map {out}")
    print(f"run health: {json.dumps(health.summary())}")
    if gt:
        write_kitti_trajectory(f"{store.traj_dir}/ground_truth.txt", np.stack(gt))
        print(f"ATE vs ground truth: {ate_rmse(np.stack(est), np.stack(gt)):.3f} m")
    return 0


def _run_matching(args) -> int:
    import jax.numpy as jnp

    from .config import load_config
    from .pipeline import Matching

    cfg = load_config(args.config)
    with np.load(f"{args.map}/map/filtered_map.npz") as z:
        gmap = z["points"]
    matcher = Matching(cfg.matching, gmap)
    errs = []
    for i, frame in enumerate(_prefetch(_frame_source(args))):
        if not matcher.has_inited():
            matcher.update(frame["points"])
            init = frame.get("gnss_pose")
            if init is None and frame.get("gt_pose") is not None:
                init = frame["gt_pose"]
            if init is not None:
                matcher.set_gnss_pose(init)
            continue
        pose = matcher.update(frame["points"])
        if frame.get("gt_pose") is not None and pose is not None:
            errs.append(np.linalg.norm(pose[:3, 3] - frame["gt_pose"][:3, 3]))
        if i % 20 == 0 and pose is not None:
            print(f"frame {i}: pose {pose[:3, 3]}")
    if errs:
        print(f"localization mean error: {np.mean(errs):.3f} m over {len(errs)} frames")
    return 0


def _AloamFrontEnd(capacity: int = 131072):
    """A-LOAM front end behind the FrontEnd.update API — the
    mapping_with_aloam.launch wiring (A-LOAM odometry+mapping feeding the
    lidar_localization back end), fused into one device program per sweep
    (pipeline/aloam/pipeline.py). `capacity` sizes the padded sweep (131072
    covers KITTI HDL-64; the synthetic spinning simulator emits 65536)."""
    from .pipeline.aloam import AloamPipeline, FeatureExtractionConfig

    return AloamPipeline(
        FeatureExtractionConfig(
            n_scans=64, min_range=2.5, capacity=capacity,
            max_sharp=1024, max_less_sharp=8192, max_flat=2048, max_less_flat=16384,
        )
    )


def _run_inspect(args) -> int:
    """Integration sanity check of data decode + extrinsics + ENU — the
    test_frame_node role (src/apps/test_frame_node.cpp:22-99) without rviz:
    prints per-frame stats and validates pose/point invariants."""
    ok = True
    for i, frame in enumerate(_frame_source(args)):
        if i >= args.frames:
            break
        pts = np.asarray(frame["points"])
        finite = np.isfinite(pts).all(axis=1)
        r = np.linalg.norm(pts[finite], axis=1) if finite.any() else np.zeros(1)
        pose = frame.get("gnss_pose", frame.get("gt_pose"))
        line = (
            f"frame {i}: {len(pts)} pts ({finite.mean()*100:.1f}% finite), "
            f"range [{r.min():.1f}, {r.max():.1f}] m"
        )
        if pose is not None:
            R = np.asarray(pose)[:3, :3]
            orth = np.abs(R @ R.T - np.eye(3)).max()
            line += f", pose t={np.asarray(pose)[:3, 3]}, |RR^T - I|={orth:.1e}"
            if orth > 1e-3:
                ok = False
                line += "  <-- NON-ORTHONORMAL ROTATION"
        print(line)
    print("inspect:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def _frame_source(args):
    """Yield frames from KITTI raw / odometry dirs or the synthetic world."""
    if getattr(args, "kitti_raw", None):
        import os

        from .io.kitti import KittiRawReader
        from .io.kitti_writer import read_bbox_dir

        # detector-bbox channel: explicit --bbox-dir, else the conventional
        # <date_dir>/bbox/<drive_id> next to the drive (the reference's
        # hard-coded per-frame txt path made explicit, front_end.cpp:427-530)
        bbox_dir = getattr(args, "bbox_dir", None)
        if bbox_dir is None:
            drive = os.path.basename(os.path.normpath(args.kitti_raw))
            parts = drive.split("_drive_")
            if len(parts) == 2:
                cand = os.path.join(
                    os.path.dirname(os.path.normpath(args.kitti_raw)),
                    "bbox",
                    parts[1].replace("_sync", ""),
                )
                bbox_dir = cand if os.path.isdir(cand) else None
        for f in KittiRawReader(args.kitti_raw):
            yield {
                "points": f["points"],
                "time": f["time"],
                "gnss_position": f["gnss_pose"][:3, 3],
                "gnss_pose": f["gnss_pose"],
                "bboxes": read_bbox_dir(bbox_dir, f["index"]) if bbox_dir else None,
            }
    elif getattr(args, "kitti_odometry", None):
        from .io.kitti import KittiOdometryReader

        root, seq = args.kitti_odometry.rsplit(":", 1)
        for f in KittiOdometryReader(root, seq):
            yield {"points": f["points"], "time": f["time"], "gt_pose": f["gt_pose"]}
    else:
        from .io.synthetic import (
            SyntheticWorld,
            make_hairpin_trajectory,
            make_trajectory,
            simulate_scan,
            simulate_spinning_scan,
        )

        n = int(args.synthetic)
        world = SyntheticWorld.corridor(length=max(40, n), seed=0)
        if n >= 72:
            # long runs: out-and-back with a realistically-rated U-turn
            # (<= ~5 deg/frame, like a car at 10 Hz)
            n_turn = max(36, n // 2)
            rest = max(2, (n - n_turn) // 2)
            gt = make_hairpin_trajectory(n_out=rest, n_turn=n_turn, n_back=rest, speed=1.0)
        else:
            gt = make_trajectory(n, speed=1.0)
        spinning = getattr(args, "front_end", "ndt") == "aloam"
        for i in range(len(gt)):
            if spinning:
                pts, mask = simulate_spinning_scan(
                    world, gt[i], t=i * 0.1, n_scans=64, n_azimuth=1024, seed=i
                )
                bboxes = None
            else:
                pts, mask, bboxes = simulate_scan(world, gt[i], t=i * 0.1, n_points=16384, seed=i)
            yield {
                "points": pts[mask],
                "time": i * 0.1,
                "gt_pose": gt[i],
                "gnss_position": gt[i][:3, 3] + np.random.default_rng(i).normal(0, 0.3, 3),
                "bboxes": bboxes,
            }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lidar_slam_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_source(sp):
        sp.add_argument("--kitti-raw", help="KITTI raw *_sync drive directory")
        sp.add_argument(
            "--bbox-dir", dest="bbox_dir", default=None,
            help="per-frame detector bbox txt dir (default: <date>/bbox/<drive> "
                 "next to --kitti-raw when present)",
        )
        sp.add_argument("--kitti-odometry", help="KITTI odometry '<root>:<seq>'")
        sp.add_argument("--synthetic", default=None, help="synthetic run with N frames")
        sp.add_argument("--config", default=None, help="YAML config path")

    mp = sub.add_parser("mapping", help="build a map (front end + back end + loops)")
    add_source(mp)
    mp.add_argument("--out", default="slam_data")
    mp.add_argument(
        "--mesh-devices",
        type=int,
        default=0,
        help="shard per-frame NDT reductions over N local devices (0 = off)",
    )
    mp.add_argument(
        "--front-end", dest="front_end", choices=["ndt", "aloam"], default="ndt",
        help="odometry front end: NDT scan-to-map (mapping.launch) or "
             "A-LOAM two-stage (mapping_with_aloam.launch)",
    )
    mp.add_argument(
        "--resume", action="store_true",
        help="continue an interrupted mapping run from --out's keyframe "
             "store + progress checkpoint (the reference wipes and restarts)",
    )

    lp = sub.add_parser("matching", help="localize against a prebuilt map")
    add_source(lp)
    lp.add_argument("--map", default="slam_data")

    ip = sub.add_parser(
        "inspect",
        help="decode + sanity-check a frame source (the test_frame_node role)",
    )
    add_source(ip)
    ip.add_argument("--frames", type=int, default=5)

    bp = sub.add_parser("bench", help="run the headline benchmark")

    args = p.parse_args(argv)
    # persistent XLA compilation cache: kills the cold-start compile cost on
    # second and later runs (the reference starts in seconds; first-trace
    # compiles here are tens of seconds per program without it)
    from .utils import enable_persistent_cache

    enable_persistent_cache()
    if args.cmd == "mapping":
        if not (args.kitti_raw or args.kitti_odometry or args.synthetic):
            p.error("mapping needs --kitti-raw, --kitti-odometry or --synthetic N")
        return _run_mapping(args)
    if args.cmd == "matching":
        if not (args.kitti_raw or args.kitti_odometry or args.synthetic):
            p.error("matching needs a frame source")
        return _run_matching(args)
    if args.cmd == "inspect":
        if not (args.kitti_raw or args.kitti_odometry or args.synthetic):
            p.error("inspect needs a frame source")
        return _run_inspect(args)
    if args.cmd == "bench":
        import runpy

        runpy.run_path("bench.py", run_name="__main__")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Multi-device scaling-efficiency measurement.

The BASELINE north star asks for >=80% frames/s scaling efficiency at >=2
hosts with keyframes/map blocks sharded. This harness measures the two
sharded reductions (point-sharded NDT derivative evaluation, edge-sharded
pose-graph PCG) across mesh sizes and reports efficiency relative to the
1-device throughput. On a CPU host-platform mesh the absolute numbers are
meaningless but the harness and its invariants (identical results across
mesh sizes) are exercised; on a pod slice the same entry point produces
the real scaling curve.

Usage:  python -m lidar_slam_tpu.parallel.scaling_bench [n_points]
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np


def measure_scaling(n_points: int = 65536, repeats: int = 10, device_counts=None) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from ..models.registration import NDTConfig, build_ndt_map
    from ..ops.pointcloud import PointCloud
    from .mesh import make_mesh
    from .sharded_ndt import sharded_ndt_derivatives

    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    cfg = NDTConfig(resolution=1.0, grid_dims=(128, 128, 32), point_chunk=min(8192, n_points))
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, (n_points, 3)).astype(np.float32)
    pts[:, 2] *= 0.06
    target = PointCloud.from_points(pts)
    ndt_map = build_ndt_map(target, cfg)
    jax.block_until_ready(ndt_map.packed)
    source = PointCloud.from_points(pts + 0.1)
    pose = jnp.zeros(6)

    from .sharded_ndt import sharded_build_ndt_map

    origin = jnp.floor(jnp.min(target.points, axis=0) - 1.0)

    results = []
    base_rate = None
    base_build = None
    for d in device_counts:
        mesh = make_mesh(d)
        # warmup/compile
        out = sharded_ndt_derivatives(ndt_map, source, pose, cfg, mesh)
        m = sharded_build_ndt_map(target, origin, cfg, mesh)
        jax.block_until_ready((out, m.packed))
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = sharded_ndt_derivatives(ndt_map, source, pose, cfg, mesh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / repeats
        t0 = time.perf_counter()
        for _ in range(repeats):
            m = sharded_build_ndt_map(target, origin, cfg, mesh)
        jax.block_until_ready(m.packed)
        dt_build = (time.perf_counter() - t0) / repeats
        rate = n_points / dt
        if base_rate is None:
            base_rate = rate
            base_build = dt_build
        eff = rate / (base_rate * d)
        results.append(
            {
                "devices": d,
                "eval_ms": dt * 1000.0,
                "points_per_s": rate,
                "scaling_efficiency": eff,
                "map_build_ms": dt_build * 1000.0,
                "map_build_speedup": base_build / dt_build,
                "score": float(out[0]),
            }
        )
    return results


def main():
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rows = measure_scaling(n)
    # results must agree across mesh sizes (same reduction, different layout)
    scores = [r["score"] for r in rows]
    for r in rows:
        print(
            f"devices={r['devices']:3d}  eval {r['eval_ms']:8.2f} ms  "
            f"{r['points_per_s']:12.0f} pts/s  efficiency {r['scaling_efficiency']:.2f}  "
            f"map build {r['map_build_ms']:8.2f} ms  speedup {r['map_build_speedup']:.2f}x"
        )
    spread = max(scores) - min(scores)
    print(f"cross-mesh score spread: {spread:.3e} (must be ~0)")


if __name__ == "__main__":
    main()

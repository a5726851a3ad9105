import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.pipeline.aloam.feature_extraction import extract_features, FeatureExtractionConfig
from lidar_slam_tpu.ops.hashgrid import build_bucket_grid
from lidar_slam_tpu.ops.pallas.knn_fused import window_knn
from lidar_slam_tpu.pipeline.aloam.odometry import sort_by_cell

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(10, speed=1.5)
fc = FeatureExtractionConfig()
pts, mask, _ = simulate_scan(world, traj[0], max_range=80.0, n_points=131072, seed=0, noise=0.01)
f0 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)
pts, mask, _ = simulate_scan(world, traj[1], max_range=80.0, n_points=131072, seed=1, noise=0.01)
f1 = extract_features(jnp.asarray(pts.astype(np.float32)), jnp.asarray(mask), fc)

grid = build_bucket_grid(f0.less_flat, 5.0, (48, 48, 8))
o = sort_by_cell(grid, f1.flat.points, f1.flat.mask)
Q, QM = np.asarray(f1.flat.points[o]), np.asarray(f1.flat.mask[o])
ring = np.asarray(f0.less_flat_ring)
r = window_knn(grid, jnp.asarray(Q), jnp.asarray(QM), k=8, max_radius=5.0, extras=f0.less_flat_ring, window=2048)
print("unresolved:", float(r["unresolved"]))
dist = np.asarray(r["dist"]); idx = np.asarray(r["idx"]); ok = np.asarray(r["ok"]); rpts = np.asarray(r["pts"]); rext = np.asarray(r["extras"])

T = np.asarray(f0.less_flat.points); TM = np.asarray(f0.less_flat.mask)
Tv = T[TM]; iv = np.where(TM)[0]
# grid in-bounds filter like build_bucket_grid
org = np.asarray(grid.origin); dims = (48,48,8)
co = np.floor((Tv - org)/5.0).astype(int)
inb = np.all((co>=0)&(co<np.asarray(dims)),axis=-1)
Tv, iv = Tv[inb], iv[inb]

rng = np.random.default_rng(0)
bad = 0; checked = 0
for qi in rng.choice(np.where(QM)[0], 200, replace=False):
    d = np.linalg.norm(Tv - Q[qi], axis=1)
    order = np.argsort(d)
    d_true = d[order][:8]
    d_true = d_true[d_true <= 5.0]
    d_mine = dist[qi][ok[qi]]
    checked += 1
    if len(d_true) != len(d_mine) or not np.allclose(d_true, d_mine, atol=2e-3):
        bad += 1
        if bad <= 3:
            print("MISMATCH q", qi, "true", d_true[:5], "mine", d_mine[:5])
    # extras check
    for j in range(len(d_mine)):
        if abs(rext[qi, j, 0] - ring[idx[qi, j]]) > 1e-5:
            print("RING MISMATCH", qi, j); bad += 1; break
print(f"checked {checked}, mismatches {bad}")

import time
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.ops.hashgrid import build_bucket_grid, knn_query, _flat_cell_id
from lidar_slam_tpu.ops.pallas.knn_fused import window_knn
from lidar_slam_tpu.ops import PointCloud, voxel_downsample

def timeit(fn, *args, n=15, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n * 1e3

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(10, speed=1.5)
pts, mask, _ = simulate_scan(world, traj[0], max_range=80.0, n_points=131072, seed=0, noise=0.01)
tc = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
tc = voxel_downsample(tc, 0.8, out_capacity=131072)
grid = build_bucket_grid(tc, 1.0, (192, 192, 32))
print("target valid:", int(tc.num_valid()))

pts2, mask2, _ = simulate_scan(world, traj[1], max_range=80.0, n_points=131072, seed=1, noise=0.01)
qc = PointCloud.from_points(pts2[mask2].astype(np.float32), capacity=32768)
Q, QM = qc.points, qc.mask
# sort queries by cell for the fused path
coords = jnp.clip(jnp.floor((Q - grid.origin)/1.0).astype(jnp.int32), 0, jnp.asarray((192,192,32))-1)
cid = jnp.where(QM, _flat_cell_id(coords, (192,192,32)), 2**30)
o = jnp.argsort(cid)
Qs, QMs = Q[o], QM[o]

f_ref = jax.jit(lambda g, q: knn_query(g, q, k=5, max_radius=1.0, bucket_k=16, chunk=2048))
f_fus = jax.jit(lambda g, q, m: window_knn(g, q, m, k=5, max_radius=1.0, window=2048, tile=128))

i0, d0, k0 = f_ref(grid, Qs)
r = f_fus(grid, Qs, QMs)
print("unresolved:", float(r["unresolved"]))
d0n, d1n = np.asarray(d0), np.asarray(r["dist"])
k0n, k1n = np.asarray(k0), np.asarray(r["ok"])
# ref path can truncate (bucket_k) and also returns neighbours for masked...
valid_rows = np.asarray(QMs)
agree = (np.abs(np.where(np.isfinite(d0n), d0n, 0) - np.where(np.isfinite(d1n), d1n, 0)) < 1e-3) | (~k0n & ~k1n)
print("ok match frac:", (k0n == k1n)[valid_rows].mean(), "dist agree frac:", agree[valid_rows].mean())
# pts consistency: fused pts must equal target points at idx
ptsn = np.asarray(r["pts"]); idxn = np.asarray(r["idx"]) ; tp = np.asarray(tc.points)
sel = k1n
print("pts==points[idx]:", np.allclose(ptsn[sel], tp[idxn[sel]], atol=1e-5))
print("ms ref:", timeit(f_ref, grid, Qs), "ms fused:", timeit(f_fus, grid, Qs, QMs))

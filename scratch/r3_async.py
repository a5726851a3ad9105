import time, sys, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map, ndt_align
from lidar_slam_tpu.ops import PointCloud, voxel_downsample, finite_mask

# tunnel RTT calibration
f0 = jax.jit(lambda x: x + 1.0)
x = jnp.float32(0.0)
x = f0(x); jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(20):
    x = f0(x); jax.block_until_ready(x)
print(f"tiny-op RTT: {(time.perf_counter()-t0)/20*1e3:.2f} ms", file=sys.stderr)
t0 = time.perf_counter()
for _ in range(20):
    x = f0(x)
jax.block_until_ready(x)
print(f"tiny-op async chain: {(time.perf_counter()-t0)/20*1e3:.2f} ms", file=sys.stderr)

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
base = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192, stencil="direct7",
                 max_iter=30, gather="fused", fused_window=512)
mcd = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
ndt_map = build_ndt_map(mcd, base)
jax.block_until_ready(ndt_map.packed)

n_frames = 20
rng = np.random.default_rng(7)
frames = []
for i in range(n_frames):
    fi = 10 + (i % 20)
    pts, mask, _ = simulate_scan(world, traj[fi], max_range=80.0, n_points=131072, seed=1000 + i, noise=0.02)
    guess = traj[fi].copy()
    guess[:3, 3] += rng.normal(0, 0.3, 3)
    a = rng.normal(0, np.deg2rad(1.0))
    c, s = np.cos(a), np.sin(a)
    guess[:3, :3] = guess[:3, :3] @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    frames.append((jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(guess, jnp.float32)))

@jax.jit
def step(m_arg, points, mask, guess):
    m = mask & finite_mask(points)
    cloud = PointCloud(points=jnp.where(m[:, None], points, 0.0), mask=m)
    frame = voxel_downsample(cloud, 0.5, out_capacity=32768)
    r = ndt_align(m_arg, frame, guess, base)
    return r.pose, r.iterations, r.unresolved

pose, it, un = step(ndt_map, *frames[0]); jax.block_until_ready(pose)

# sequential (block per frame)
t0 = time.perf_counter()
outs = []
for pts, mask, guess in frames:
    pose, it, un = step(ndt_map, pts, mask, guess)
    jax.block_until_ready(pose)
    outs.append((pose, it, un))
dt = time.perf_counter() - t0
print(f"sequential: {dt/n_frames*1e3:.1f} ms/frame = {n_frames/dt:.1f} fps", file=sys.stderr)

# async pipelined (block once)
t0 = time.perf_counter()
outs = [step(ndt_map, *f) for f in frames]
jax.block_until_ready([o[0] for o in outs])
dt = time.perf_counter() - t0
print(f"async: {dt/n_frames*1e3:.1f} ms/frame = {n_frames/dt:.1f} fps", file=sys.stderr)
iters = [int(o[1]) for o in outs]
unres = max(float(o[2]) for o in outs)
errs = [float(np.linalg.norm(np.asarray(o[0])[:3, 3] - traj[10 + (i % 20)][:3, 3])) for i, o in enumerate(outs)]
print(f"iters mean {np.mean(iters):.1f} | err mean {np.mean(errs)*100:.1f} cm max {np.max(errs)*100:.1f} | unresolved {unres}", file=sys.stderr)

import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan
from lidar_slam_tpu.models.registration import NDTConfig, build_ndt_map
from lidar_slam_tpu.models.registration.ndt import _flat_vid
from lidar_slam_tpu.ops import PointCloud, voxel_downsample
from lidar_slam_tpu.ops.pallas.ndt_fused import KEY_SENTINEL

world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(40, speed=2.0)
kf = []
for i in range(0, 40, 2):
    pts, mask, _ = simulate_scan(world, traj[i], max_range=80.0, n_points=131072, seed=i, noise=0.015)
    w = pts[mask] @ traj[i][:3, :3].T + traj[i][:3, 3]
    kf.append(w[:16384])
mc = PointCloud.from_points(np.concatenate(kf).astype(np.float32))
mc = voxel_downsample(mc, 0.3, out_capacity=mc.capacity)
base = NDTConfig(resolution=1.0, grid_dims=(256,256,64), stencil="direct7", max_compact_voxels=8192)
ndt_map = build_ndt_map(mc, base)

pts, mask, _ = simulate_scan(world, traj[20], max_range=80.0, n_points=131072, seed=99, noise=0.015)
fr = PointCloud.from_points(pts[mask].astype(np.float32), capacity=131072)
fr = voxel_downsample(fr, 0.5, out_capacity=32768)

pose6 = np.asarray([0.1,0.05,0.0,0.0,0.0,0.02], np.float32)
from lidar_slam_tpu.geom.se3 import euler_xyz_to_matrix
R = np.asarray(euler_xyz_to_matrix(pose6[3], pose6[4], pose6[5]))
P = np.asarray(fr.points); M = np.asarray(fr.mask)
dims = base.grid_dims
origin = np.asarray(ndt_map.origin)
xp = P @ R.T + pose6[:3]
cell = np.floor((xp - origin) / 1.0).astype(np.int32)
cell[~M] = -(2**20)
vid0 = (cell[:,0]*dims[1] + cell[:,1])*dims[2] + cell[:,2]
inb = np.all((cell >= 0) & (cell < np.asarray(dims)), axis=-1)
vid0s = np.where(inb, vid0, 2**30)
order = np.argsort(vid0s, kind="stable")
vid_sorted = vid0s[order]
cell_s = cell[order]

keys = np.asarray(ndt_map.keys)
cpad = (-keys.shape[0]) % 128
keys = np.pad(keys, (0, cpad), constant_values=-1)
keys = np.where(keys < 0, 2**30, keys).astype(np.int64)
c = keys.shape[0]
window = 2048
span = dims[1]*dims[2]
tile = 256
G = len(vid_sorted)//tile
vm = vid_sorted.reshape(G, tile).min(axis=1).astype(np.int64) - span
lo_key = np.searchsorted(keys, vm, side="left")
lo = np.clip((lo_key//128)*128, 0, c - window)

# now per tile simulate unresolved
offs = np.asarray([[0,0,0],[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1]])
keyset = set(keys[keys < 2**30].tolist())
total_unres = 0; real_miss = 0
for g in range(G):
    kw = keys[lo[g]:lo[g]+window]
    kf_, kl = kw.min(), kw.max()
    cells_g = cell_s[g*tile:(g+1)*tile]
    for o in offs:
        cand = cells_g + o
        ib = np.all((cand >= 0) & (cand < np.asarray(dims)), axis=-1)
        v = (cand[:,0]*dims[1] + cand[:,1])*dims[2] + cand[:,2]
        un = ib & ((v < kf_) | (v > kl))
        total_unres += un.sum()
        for vv in v[un]:
            if vv in keyset: real_miss += 1
print("tiles:", G, "occupancy:", int((keys<2**30).sum()))
print("lo range:", lo.min(), lo.max(), "lo_key:", lo_key.min(), lo_key.max())
print("simulated unresolved:", total_unres, "actual existing-key misses:", real_miss)
# inspect the first few offending tiles
bad = []
for g in range(G):
    kw = keys[lo[g]:lo[g]+window]
    kf_, kl = kw.min(), kw.max()
    cells_g = cell_s[g*tile:(g+1)*tile]
    cand = (cells_g[:,None,:] + offs[None]).reshape(-1,3)
    ib = np.all((cand >= 0) & (cand < np.asarray(dims)), axis=-1)
    v = (cand[:,0]*dims[1] + cand[:,1])*dims[2] + cand[:,2]
    n_un = (ib & ((v < kf_) | (v > kl))).sum()
    if n_un: bad.append((g, n_un, int(kf_), int(kl), int(v[ib].min()), int(v[ib].max())))
print(bad[:5])

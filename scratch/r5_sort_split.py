"""What inside voxel_downsample costs 6.3 ms: the argsort, the reorder
gathers, or the segment ops? Each stage chained x20 in one program."""
import time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.io import SyntheticWorld, make_trajectory, simulate_scan

RAW = 131072
world = SyntheticWorld.corridor(length=120.0, width=18.0, density=40.0, seed=0)
traj = make_trajectory(12, speed=2.0)
pts, mask, _ = simulate_scan(world, traj[5], max_range=80.0, n_points=RAW, seed=7, noise=0.02)
pts_d, msk_d = jnp.asarray(pts), jnp.asarray(mask)
K = 20

def timed(name, fn, *args):
    out = fn(*args); jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name}: {(time.time()-t0)/3/K*1000:.3f} ms", flush=True)

def keys_of(p, m, salt):
    coords = jnp.floor((p + salt * 1e-12) / 0.5).astype(jnp.int32)
    big_c = jnp.int32(2**20)
    cmin = jnp.min(jnp.where(m[:, None], coords, big_c), axis=0)
    rel = jnp.clip(coords - cmin, 0, jnp.asarray([2047, 2047, 510], jnp.int32))
    key = (rel[:, 0] << 20) | (rel[:, 1] << 9) | rel[:, 2]
    return jnp.where(m, key, jnp.iinfo(jnp.int32).max)

@jax.jit
def keys_only(p, m):
    def body(acc, _):
        return acc + jnp.float32(keys_of(p, m, acc)[0]), None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

@jax.jit
def sort_keys(p, m):
    def body(acc, _):
        sk = jnp.sort(keys_of(p, m, acc))
        return acc + jnp.float32(sk[0]), None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

@jax.jit
def argsort_keys(p, m):
    def body(acc, _):
        o = jnp.argsort(keys_of(p, m, acc))
        return acc + jnp.float32(o[0]), None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

@jax.jit
def argsort_gather(p, m):
    def body(acc, _):
        key = keys_of(p, m, acc)
        o = jnp.argsort(key)
        sp = p[o]
        return acc + sp[0, 0], None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

@jax.jit
def sortkv_multi(p, m):
    # sort_key_val carrying the payload channels through the sort itself
    def body(acc, _):
        key = keys_of(p, m, acc)
        sk, sx, sy, sz, sm = jax.lax.sort(
            (key, p[:, 0], p[:, 1], p[:, 2], m.astype(jnp.int32)), num_keys=1
        )
        return acc + sx[0], None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=K)[0]

timed("keys only        ", keys_only, pts_d, msk_d)
timed("keys + sort      ", sort_keys, pts_d, msk_d)
timed("keys + argsort   ", argsort_keys, pts_d, msk_d)
timed("argsort + gather3", argsort_gather, pts_d, msk_d)
timed("multi-operand sort", sortkv_multi, pts_d, msk_d)

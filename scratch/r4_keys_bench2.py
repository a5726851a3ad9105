import time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

v = 256*256*64
cap = 65536
rng = np.random.default_rng(0)
occ_np = np.zeros(v, bool)
occ_np[rng.choice(v, 30000, replace=False)] = True
occ = jnp.asarray(occ_np)
k_ref = np.full(cap+1, -1, np.int32); nz = np.nonzero(occ_np)[0][:cap]; k_ref[:len(nz)] = nz

def timeit(name, fn, *args, reps=20):
    r = fn(*args); jax.device_get(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.device_get(r)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms")

def check(fn):
    pos = None
    k = np.asarray(fn(occ))
    return bool((k == k_ref).all())

@jax.jit
def m_drop(occ):
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    in_cap = occ & (pos < cap)
    st = jnp.where(in_cap, pos, cap + 1)  # out of range -> dropped
    idx = jnp.arange(v, dtype=jnp.int32)
    return jnp.full((cap+1,), -1, jnp.int32).at[st].set(idx, mode="drop")

@jax.jit
def m_drop_hints(occ):
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    in_cap = occ & (pos < cap)
    st = jnp.where(in_cap, pos, cap + 1)
    idx = jnp.arange(v, dtype=jnp.int32)
    return jnp.full((cap+1,), -1, jnp.int32).at[st].set(
        idx, mode="drop", indices_are_sorted=True, unique_indices=True)

@jax.jit
def m_ss2(occ):
    # two-level searchsorted: block summary then refine
    blk = 1024
    pos = jnp.cumsum(occ.astype(jnp.int32))  # [V]
    total = pos[-1]
    bsum = pos[blk-1::blk]  # [V/blk]
    j = jnp.arange(cap+1, dtype=jnp.int32)
    b = jnp.searchsorted(bsum, j + 1, side="left").astype(jnp.int32)  # block id
    # refine inside block [b*blk, (b+1)*blk) with 10 binary steps on the big array
    lo = b * blk
    hi = lo + blk
    def step(carry, _):
        lo, hi = carry
        mid = (lo + hi) // 2
        go_right = pos[jnp.clip(mid, 0, v-1)] < j + 1
        return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)), None
    (lo, hi), _ = jax.lax.scan(step, (lo, hi), None, length=10)
    keys = jnp.where(j < jnp.minimum(total, cap), lo, -1)
    return keys

timeit("scatter drop-oob", m_drop, occ)
timeit("scatter drop-oob+hints", m_drop_hints, occ)
timeit("two-level searchsorted", m_ss2, occ)
print("drop correct:", check(m_drop), " hints correct:", check(m_drop_hints), " ss2 correct:", check(m_ss2))

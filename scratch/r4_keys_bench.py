"""Compare compact-key extraction primitives at V=4.19M, cap=65536."""
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

def timeit(name, fn, *args, reps=20):
    r = fn(*args); jax.device_get(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.device_get(r)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms")

@jax.jit
def m_scatter(occ):
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    in_cap = occ & (pos < cap)
    st = jnp.where(in_cap, pos, cap)
    idx = jnp.arange(v, dtype=jnp.int32)
    keys = jnp.full((cap+1,), -1, jnp.int32).at[st].set(jnp.where(in_cap, idx, -1), mode="drop")
    return keys.sum()

@jax.jit
def m_searchsorted(occ):
    pos = jnp.cumsum(occ.astype(jnp.int32))  # [V] counts
    total = pos[-1]
    j = jnp.arange(cap+1, dtype=jnp.int32)
    keys = jnp.searchsorted(pos, j + 1, side="left").astype(jnp.int32)
    keys = jnp.where(j < jnp.minimum(total, cap), keys, -1)
    return keys.sum()

@jax.jit
def m_nonzero(occ):
    (keys,) = jnp.nonzero(occ, size=cap+1, fill_value=-1)
    return keys.sum()

timeit("scatter (current)", m_scatter, occ)
timeit("searchsorted", m_searchsorted, occ)
timeit("nonzero(size)", m_nonzero, occ)
# correctness cross-check
k1 = np.full(cap+1, -1, np.int32); nz = np.nonzero(occ_np)[0][:cap]; k1[:len(nz)] = nz
@jax.jit
def keys_ss(occ):
    pos = jnp.cumsum(occ.astype(jnp.int32))
    total = pos[-1]
    j = jnp.arange(cap+1, dtype=jnp.int32)
    keys = jnp.searchsorted(pos, j + 1, side="left").astype(jnp.int32)
    return jnp.where(j < jnp.minimum(total, cap), keys, -1)
print("searchsorted correct:", bool((np.asarray(keys_ss(occ)) == k1).all()))

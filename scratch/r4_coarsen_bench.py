import time
import numpy as np
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from lidar_slam_tpu.models.registration import NDTConfig, empty_ndt_sums, scatter_to_sums, coarsen_ndt_sums

cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64))
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(5, 200, (16384, 3)).astype(np.float32))
sums = jax.jit(scatter_to_sums)(empty_ndt_sums(jnp.zeros(3), cfg), pts, jnp.ones(16384, bool), jnp.ones(16384, jnp.float32))
jax.device_get(sums.count.sum())

def timeit(name, fn, *args, reps=15):
    r = fn(*args); jax.device_get(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.device_get(r)
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms")

@jax.jit
def current(s):
    c = coarsen_ndt_sums(s)
    return c.count.sum() + c.psum.sum() + c.ppsum.sum()

# slice-based variant: parity sums via major-dim slicing + z-pair matmul
@jax.jit
def slicev(s):
    d0, d1, d2 = s.dims
    r = jnp.float32(s.resolution)
    P = jnp.zeros((d2, d2 // 2), jnp.float32).at[jnp.arange(d2), jnp.arange(d2) // 2].set(1.0)
    Pz = jnp.zeros((d2, d2 // 2), jnp.float32).at[jnp.arange(d2), jnp.arange(d2) // 2].set(
        jnp.arange(d2, dtype=jnp.float32) % 2)

    def zred(a):   # [X, Y, Z] -> [X, Y, Z/2] plain pair sum (MXU)
        return a @ P
    def zredw(a):  # weighted by z-parity (for the dz terms)
        return a @ Pz

    cnt = s.count.reshape(d0, d1, d2)
    px = s.psum[:, 0].reshape(d0, d1, d2)
    py = s.psum[:, 1].reshape(d0, d1, d2)
    pz = s.psum[:, 2].reshape(d0, d1, d2)

    def xy_red(a, wx=False, wy=False):
        # [X, Y, Zc] -> [X/2, Y/2, Zc]; optional parity weights on x/y
        if wx:
            a = a[1::2] + 0.0 * a[0::2] if False else a[1::2]
            ax = a
        # simpler: handle weights by slicing directly below
        return None

    # count
    cz = zred(cnt)
    cc = cz[0::2, 0::2] + cz[0::2, 1::2] + cz[1::2, 0::2] + cz[1::2, 1::2]
    # psum z: pz' = pz + cnt*dz -> zred(pz) + r*zredw(cnt), then plain xy sum
    pzc = zred(pz) + r * zredw(cnt)
    pzc = pzc[0::2, 0::2] + pzc[0::2, 1::2] + pzc[1::2, 0::2] + pzc[1::2, 1::2]
    # psum x: px' = px + cnt*dx; dx = r for odd x slices
    pxz = zred(px); cz2 = cz
    pxc = (pxz[0::2, 0::2] + pxz[0::2, 1::2]
           + pxz[1::2, 0::2] + r * cz2[1::2, 0::2]
           + pxz[1::2, 1::2] + r * cz2[1::2, 1::2])
    pyz = zred(py)
    pyc = (pyz[0::2, 0::2] + pyz[1::2, 0::2]
           + pyz[0::2, 1::2] + r * cz2[0::2, 1::2]
           + pyz[1::2, 1::2] + r * cz2[1::2, 1::2])
    return cc.sum() + pxc.sum() + pyc.sum() + pzc.sum()

timeit("coarsen current (count+psum+ppsum)", current, sums)
timeit("slice/matmul variant (count+psum only)", slicev, sums)

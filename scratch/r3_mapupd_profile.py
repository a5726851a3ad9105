"""Profile incremental map update sub-stages on the TPU."""
import sys
import time

import numpy as np


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from lidar_slam_tpu.models.registration import (
        NDTConfig,
        empty_ndt_sums,
        finalize_ndt_sums,
        recenter_ndt_sums,
        scatter_to_sums,
    )

    cfg = NDTConfig(resolution=1.0, grid_dims=(256, 256, 64), point_chunk=8192,
                    max_compact_voxels=65536)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 120, (16384, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(-9, 9, 16384)
    pts[:, 2] = rng.uniform(0, 6, 16384)
    mask = jnp.ones(16384, bool)
    w = jnp.ones(16384, jnp.float32)
    origin = jnp.asarray([-128.0, -128.0, -32.0])

    sums = empty_ndt_sums(origin, cfg)
    sums = scatter_to_sums(sums, jnp.asarray(pts), mask, w)
    jax.device_get(sums.origin)

    scat = jax.jit(lambda s, p: scatter_to_sums(s, p, mask, w))
    rec0 = jax.jit(lambda s: recenter_ndt_sums(s, origin))  # zero shift
    rec1 = jax.jit(lambda s: recenter_ndt_sums(s, origin + jnp.asarray([2.0, 1.0, 0.0])))
    fin = partial(jax.jit, static_argnames="c")(lambda s, c: finalize_ndt_sums(s, c))

    print(f"scatter 16k pts:        {timeit(scat, sums, jnp.asarray(pts)):7.1f} ms")
    print(f"recenter (zero shift):  {timeit(rec0, sums):7.1f} ms")
    print(f"recenter (2,1,0 shift): {timeit(rec1, sums):7.1f} ms")
    print(f"finalize:               {timeit(fin, sums, cfg):7.1f} ms")

    # finalize sub-parts
    v = cfg.grid_dims[0] * cfg.grid_dims[1] * cfg.grid_dims[2]

    @jax.jit
    def dense_mean(s):
        n = jnp.maximum(s.count, 1.0)
        return s.psum / n[:, None]

    @jax.jit
    def cumsum_occ(s):
        occ = s.count >= 6.0
        return jnp.cumsum(occ.astype(jnp.int32))

    @jax.jit
    def icov_zero_scatter(s):
        cvid = jnp.arange(65537, dtype=jnp.int32) % v
        rows = jnp.ones((65537, 3, 3), jnp.float32)
        return jnp.zeros((v, 3, 3), jnp.float32).at[cvid].set(rows, mode="drop")

    print(f"  dense mean:           {timeit(dense_mean, sums):7.1f} ms")
    print(f"  cumsum occupied:      {timeit(cumsum_occ, sums):7.1f} ms")
    print(f"  icov zero+scatter:    {timeit(icov_zero_scatter, sums):7.1f} ms")


if __name__ == "__main__":
    main()

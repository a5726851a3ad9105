import time, sys
import numpy as np
import jax, jax.numpy as jnp

# f32 matmul calibration with forced readback each call
for size, n in ((2048, 5), (4096, 3)):
    a = jnp.ones((size, size), jnp.float32)
    f = jax.jit(lambda x: (x @ x) * (1.0 / size))
    b = f(a); _ = np.asarray(b[0, 0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        b = f(b)
        _ = np.asarray(b[0, 0])
        times.append(time.perf_counter() - t0)
    gf = 2 * size**3 / 1e9
    print(f"f32 {size}^3 matmul+readback: {np.median(times)*1e3:.1f} ms -> {gf/np.median(times):.0f} GFLOP/s", file=sys.stderr)

# readback latency floor
g = jax.jit(lambda x: x + 1.0)
x = jnp.float32(0.0)
x = g(x); _ = np.asarray(x)
times = []
for _ in range(10):
    t0 = time.perf_counter()
    x = g(x)
    _ = np.asarray(x)
    times.append(time.perf_counter() - t0)
print(f"scalar roundtrip: {np.median(times)*1e3:.2f} ms", file=sys.stderr)

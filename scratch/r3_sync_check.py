import time, sys
import numpy as np
import jax, jax.numpy as jnp

# 1) known-FLOPs matmul: 4096^3 * 2 = 137 GFLOP per matmul
a = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda x: x @ x)
b = f(a); jax.block_until_ready(b)
t0 = time.perf_counter()
for _ in range(10):
    b = f(b)
jax.block_until_ready(b)
dt_block = time.perf_counter() - t0
print(f"10 matmuls block_until_ready: {dt_block*1e3:.1f} ms -> {10*137.4/dt_block:.0f} GFLOP/s", file=sys.stderr)

b = f(a)
t0 = time.perf_counter()
for _ in range(10):
    b = f(b)
_ = np.asarray(b[:1, :1])  # forced host readback
dt_host = time.perf_counter() - t0
print(f"10 matmuls + host readback: {dt_host*1e3:.1f} ms -> {10*137.4/dt_host:.0f} GFLOP/s", file=sys.stderr)

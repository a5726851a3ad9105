"""Persistent XLA compilation cache wiring.

The reference starts in seconds (`roslaunch` of precompiled C++ nodes); a JAX
process pays first-trace compilation for every jitted program instead — the
bench's map-build leg measured 220 s cold vs 0.2 s warm in round 3. JAX's
persistent compilation cache amortizes that across *processes*: compiled
executables are keyed by HLO + compile options and reloaded from disk on the
next run.

Call :func:`enable_persistent_cache` early (before the first jit compilation)
from long-lived entry points (CLI, bench). Controlled by env vars so CI and
driver runs can redirect or disable it:

- ``LIDAR_SLAM_CACHE_DIR``  — cache directory (default ``~/.cache/lidar_slam_tpu/xla``)
- ``LIDAR_SLAM_NO_CACHE=1`` — disable entirely
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "lidar_slam_tpu", "xla"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a disk directory.

    Returns the directory in use, or None when disabled. Safe to call more
    than once; also safe on backends that ignore the cache (the flags are
    no-ops there)."""
    if os.environ.get("LIDAR_SLAM_NO_CACHE", "") == "1":
        return None
    import jax

    d = cache_dir or os.environ.get("LIDAR_SLAM_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache every program regardless of size/compile time: SLAM steps are a
    # handful of large programs, so eviction pressure is not a concern
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
XLA's host-platform device-count override (SURVEY.md §4 implication).
Must run before jax initializes, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

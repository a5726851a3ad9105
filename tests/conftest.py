"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via XLA's
host-platform device-count override (SURVEY.md §4 implication).

NOTE: in this container the axon TPU plugin force-injects itself into
`jax_platforms` regardless of the JAX_PLATFORMS env var, so the env var
alone does NOT keep tests off the (single, tunneled, slow-to-compile) TPU.
`jax.config.update("jax_platforms", "cpu")` after import is authoritative.
Env vars must still be set before jax initializes for the device-count flag.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

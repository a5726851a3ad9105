"""Compiled-kernel CI tier (VERDICT r2 #10).

The main suite pins JAX to CPU (conftest), so fused Pallas kernels run only
in interpret mode there. When a real accelerator is available, set
RUN_TPU_TESTS=1 and this tier executes tests/tpu_kernel_check.py in a clean
subprocess (no forced-CPU config), proving the Mosaic-COMPILED kernels match
the XLA reference on hardware. bench.py additionally asserts the same parity
at the full production operating point every benchmark run.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="needs a real TPU; set RUN_TPU_TESTS=1 on accelerator hosts",
)
def test_fused_kernels_compiled_exactness():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":  # undo any forced-CPU test env
        del env["JAX_PLATFORMS"]
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tests", "tpu_kernel_check.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "TPU_KERNEL_CHECK_OK" in r.stdout

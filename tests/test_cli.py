import os
import subprocess
import sys

import numpy as np
import pytest


class TestPrefetch:
    def test_order_and_completion(self):
        from lidar_slam_tpu.cli import _prefetch

        assert list(_prefetch(iter(range(100)), depth=3)) == list(range(100))

    def test_producer_exception_propagates(self):
        from lidar_slam_tpu.cli import _prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = _prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)


@pytest.mark.slow
class TestCliAloamSmoke:
    def test_mapping_with_aloam_front_end(self, tmp_path):
        """The mapping_with_aloam.launch wiring through the CLI: fused A-LOAM
        front end feeding the back end / loop closing / viewer."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        out_dir = str(tmp_path / "run")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        launcher = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from lidar_slam_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))"
        )
        r = subprocess.run(
            [sys.executable, "-c", launcher, "mapping", "--synthetic", "8",
             "--front-end", "aloam", "--out", out_dir,
             "--config", "configs/synthetic_small.yaml"],
            capture_output=True, text=True, env=env, cwd=repo, timeout=1200,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "mapping done" in r.stdout
        ate_line = [l for l in r.stdout.splitlines() if "ATE vs ground truth" in l]
        assert ate_line, r.stdout[-1000:]
        ate = float(ate_line[0].split(":")[1].replace("m", "").strip())
        assert ate < 1.0, ate


@pytest.mark.slow
class TestCliSmoke:
    def test_mapping_then_matching_synthetic(self, tmp_path):
        """End-to-end CLI smoke on CPU with the small config."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONUNBUFFERED"] = "1"
        out_dir = str(tmp_path / "run")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        # force cpu inside the subprocess (axon plugin ignores the env var)
        launcher = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from lidar_slam_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))"
        )
        r = subprocess.run(
            [sys.executable, "-c", launcher, "mapping", "--synthetic", "24",
             "--out", out_dir, "--config", "configs/synthetic_small.yaml"],
            capture_output=True, text=True, env=env, cwd=repo, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "mapping done" in r.stdout
        assert os.path.exists(os.path.join(out_dir, "map", "filtered_map.npz"))
        assert os.path.exists(os.path.join(out_dir, "trajectory", "laser_odom.txt"))
        # odometry quality gate from the CLI's own ATE print
        ate_line = [l for l in r.stdout.splitlines() if "ATE vs ground truth" in l]
        assert ate_line, r.stdout[-1000:]
        ate = float(ate_line[0].split(":")[1].replace("m", "").strip())
        assert ate < 1.0, ate

        r2 = subprocess.run(
            [sys.executable, "-c", launcher, "matching", "--synthetic", "12",
             "--map", out_dir, "--config", "configs/synthetic_small.yaml"],
            capture_output=True, text=True, env=env, cwd=repo, timeout=900,
        )
        assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
        assert "localization mean error" in r2.stdout
        err = float(r2.stdout.split("localization mean error:")[1].split("m")[0])
        assert err < 1.0, r2.stdout[-500:]

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
class TestCliResume:
    def test_killed_run_resumes_and_matches(self, tmp_path):
        """Kill a mapping run mid-way (SIGKILL), resume with --resume, and
        the stitched trajectory matches an uninterrupted run (SURVEY §5.3:
        the reference can only wipe and restart)."""
        import signal
        import time as _time

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONUNBUFFERED"] = "1"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        launcher = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from lidar_slam_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))"
        )
        n_frames = "30"

        # uninterrupted baseline
        ref_dir = str(tmp_path / "ref")
        r = subprocess.run(
            [sys.executable, "-c", launcher, "mapping", "--synthetic", n_frames,
             "--out", ref_dir, "--config", "configs/synthetic_small.yaml"],
            capture_output=True, text=True, env=env, cwd=repo, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

        # start the same run, SIGKILL it once some frames are tracked (the
        # poll threshold is low and the run long so the kill always lands
        # mid-run, even when frames go fast or compiles go slow under load)
        out_dir = str(tmp_path / "killed")
        live = os.path.join(out_dir, "trajectory", "laser_odom_live.txt")
        log = open(str(tmp_path / "killed.log"), "w")
        proc = subprocess.Popen(
            [sys.executable, "-c", launcher, "mapping", "--synthetic", n_frames,
             "--out", out_dir, "--config", "configs/synthetic_small.yaml"],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=repo,
        )
        try:
            deadline = _time.time() + 900
            killed = False
            while _time.time() < deadline:
                done = 0
                if os.path.exists(live):
                    with open(live) as f:
                        done = sum(1 for _ in f)
                if done >= 8:
                    proc.send_signal(signal.SIGKILL)
                    killed = True
                    break
                if proc.poll() is not None:
                    pytest.fail(
                        "mapping run finished before it could be killed "
                        f"({done} frames seen at exit)"
                    )
                _time.sleep(0.2)
            if not killed:
                proc.send_signal(signal.SIGKILL)
                pytest.fail("mapping run never reached 8 frames within 900s")
        finally:
            proc.wait(timeout=60)
            log.close()

        # resume to completion
        r2 = subprocess.run(
            [sys.executable, "-c", launcher, "mapping", "--synthetic", n_frames,
             "--out", out_dir, "--resume", "--config", "configs/synthetic_small.yaml"],
            capture_output=True, text=True, env=env, cwd=repo, timeout=900,
        )
        assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
        assert "resumed:" in r2.stdout, r2.stdout[-1000:]
        assert "mapping done" in r2.stdout

        from lidar_slam_tpu.io.trajectory import ate_rmse, read_kitti_trajectory

        ref = read_kitti_trajectory(os.path.join(ref_dir, "trajectory", "laser_odom.txt"))
        res = read_kitti_trajectory(os.path.join(out_dir, "trajectory", "laser_odom.txt"))
        assert len(res) == len(ref), (len(res), len(ref))
        # the store round-trip (0.5 m leaf) makes the restored local map a
        # near-copy, not a bit-copy — match to cm-level, not exactly
        ate = ate_rmse(res, ref, align=False)
        assert ate < 0.05, f"resumed trajectory diverged from uninterrupted run: {ate:.3f} m"


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

"""Reproduce bench.py's front_end -> aloam ordering to find the 65 s/frame."""
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    workload = bench.build_workload()
    t0 = time.time()
    e2e_fps, upd_ms = bench.front_end_leg(workload)
    print(f"front_end leg done in {time.time()-t0:.0f}s: {e2e_fps:.2f} fps, {upd_ms:.0f} ms",
          file=sys.stderr)
    t0 = time.time()
    fps = bench.aloam_leg()
    print(f"aloam leg done in {time.time()-t0:.0f}s: {fps:.3f} fps", file=sys.stderr)


if __name__ == "__main__":
    main()

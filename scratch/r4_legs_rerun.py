import os, sys, time
sys.path.insert(0, "/root/repo")
import bench
from lidar_slam_tpu.utils import enable_persistent_cache
enable_persistent_cache()
workload = bench.build_workload()
e2e, upd, drive = bench.front_end_leg(workload)
print("front_end_e2e_fps", e2e, "map_update_ms", upd, "drive_fps", drive)
m = bench.matching_leg()
print("matching_fps", m)

from .mesh import make_mesh, device_count, distributed_init_from_env, process_count
from .sharded_ndt import (
    sharded_build_local_map,
    sharded_build_ndt_map,
    sharded_ndt_align,
    sharded_ndt_derivatives,
)
from .sharded_graph import optimize_pose_graph_sharded
from .sharded_schur import SchurGraph, optimize_pose_graph_schur, schur_prepare

__all__ = [
    "make_mesh",
    "device_count",
    "distributed_init_from_env",
    "process_count",
    "sharded_build_local_map",
    "sharded_build_ndt_map",
    "sharded_ndt_align",
    "sharded_ndt_derivatives",
    "optimize_pose_graph_sharded",
    "SchurGraph",
    "optimize_pose_graph_schur",
    "schur_prepare",
]

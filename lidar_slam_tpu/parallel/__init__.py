from .mesh import make_mesh, device_count
from .sharded_ndt import sharded_ndt_align, sharded_ndt_derivatives
from .sharded_graph import optimize_pose_graph_sharded
from .sharded_schur import SchurGraph, optimize_pose_graph_schur, schur_prepare

__all__ = [
    "make_mesh",
    "device_count",
    "sharded_ndt_align",
    "sharded_ndt_derivatives",
    "optimize_pose_graph_sharded",
    "SchurGraph",
    "optimize_pose_graph_schur",
    "schur_prepare",
]

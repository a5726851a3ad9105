from .ndt import (
    NDTConfig,
    NDTMap,
    NDTResult,
    build_ndt_map,
    ndt_derivatives,
    ndt_align,
    ndt_fitness_score,
)
from .icp import (
    ICPConfig,
    ICPTarget,
    ICPResult,
    prepare_icp_target,
    icp_align,
    estimate_normals,
)

__all__ = [
    "NDTConfig",
    "NDTMap",
    "NDTResult",
    "build_ndt_map",
    "ndt_derivatives",
    "ndt_align",
    "ndt_fitness_score",
    "ICPConfig",
    "ICPTarget",
    "ICPResult",
    "prepare_icp_target",
    "icp_align",
    "estimate_normals",
]

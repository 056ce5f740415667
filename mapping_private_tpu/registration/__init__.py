from mapping_private_tpu.registration.icp import (
    ICPResult,
    icp_point_to_plane,
    ate_rmse,
)
from mapping_private_tpu.registration.pose_graph import (
    edge_residual,
    build_normal_equations,
    optimize_pose_graph,
    make_sharded_pose_graph_step,
)

__all__ = [
    "ICPResult",
    "icp_point_to_plane",
    "ate_rmse",
    "edge_residual",
    "build_normal_equations",
    "optimize_pose_graph",
    "make_sharded_pose_graph_step",
]

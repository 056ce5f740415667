from mapping_private_tpu.parallel.mesh import make_mesh
from mapping_private_tpu.parallel.distributed import (
    make_sharded_registration_step,
    make_sharded_map_icp_step,
    make_sharded_map_icp_step_tiled,
    size_map_lattice,
)

__all__ = [
    "make_mesh",
    "make_sharded_registration_step",
    "make_sharded_map_icp_step",
    "make_sharded_map_icp_step_tiled",
    "size_map_lattice",
]

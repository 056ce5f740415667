from mapping_private_tpu.parallel.mesh import make_mesh
from mapping_private_tpu.parallel.distributed import make_sharded_registration_step

__all__ = ["make_mesh", "make_sharded_registration_step"]

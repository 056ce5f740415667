from mapping_private_tpu.ops.neighbors import (
    pairwise_sq_dists,
    knn_bruteforce,
    GridHash,
    build_grid_hash,
    knn_grid,
    radius_count_grid,
)
from mapping_private_tpu.ops.voxel import voxel_downsample
from mapping_private_tpu.ops.normals import estimate_normals, smallest_eigenvector_3x3

__all__ = [
    "pairwise_sq_dists",
    "knn_bruteforce",
    "GridHash",
    "build_grid_hash",
    "knn_grid",
    "radius_count_grid",
    "voxel_downsample",
    "estimate_normals",
    "smallest_eigenvector_3x3",
]

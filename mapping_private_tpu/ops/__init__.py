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
from mapping_private_tpu.ops.filters import (
    statistical_outlier_mask,
    remove_statistical_outliers,
    box_filter_mask,
    box_filter,
    axis_parallel_normal_mask,
    axis_perpendicular_normal_mask,
    z_band_mask,
    channel_equal_mask,
)
from mapping_private_tpu.ops.region_growing import region_grow
from mapping_private_tpu.ops.mls import mls, mls_smooth
from mapping_private_tpu.ops.nn_dispatch import nn_1nn, choose_nn_engine

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
    "statistical_outlier_mask",
    "remove_statistical_outliers",
    "box_filter_mask",
    "box_filter",
    "axis_parallel_normal_mask",
    "axis_perpendicular_normal_mask",
    "z_band_mask",
    "channel_equal_mask",
    "region_grow",
    "mls",
    "mls_smooth",
    "nn_1nn",
    "choose_nn_engine",
]

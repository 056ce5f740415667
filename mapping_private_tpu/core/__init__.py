from mapping_private_tpu.core.cloud import PointCloud
from mapping_private_tpu.core.se3 import (
    se3_exp,
    se3_log,
    se3_identity,
    se3_compose,
    se3_inverse,
    se3_apply,
)
from mapping_private_tpu.core.voxelgrid import VoxelGrid

__all__ = [
    "PointCloud",
    "VoxelGrid",
    "se3_exp",
    "se3_log",
    "se3_identity",
    "se3_compose",
    "se3_inverse",
    "se3_apply",
]

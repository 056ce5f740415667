"""End-to-end feature extraction pipelines (cloud → descriptor vectors).

Mirrors the reference's extraction tools
(color_chlac/test/example_GRSD_CCHLAC.cpp:9-86 and
color_feature_classification/test/computeFeature.cpp:40-160): compute
normals → voxelize at 0.01 m → RSD → surface types → GRSD-20 +
ColorCHLAC-117/981 → concat.

``legacy_zeroth_scale``: the reference's golden corpus
(color_chlac/demos/shape_data/*_GRSD_CCHLAC.pcd) was generated with a
build variant whose 0th-order normalizers are doubled
(color_chlac.h:22-29, the AVERAGE_COLOR_VAL branch); pass True to halve
bins [0:6] and [63:69] of the 117 part for bit-parity with those files.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.cloud import PointCloud
from mapping_private_tpu.core.voxelgrid import VoxelGrid, voxelize
from mapping_private_tpu.features.colorchlac import colorchlac117, colorchlac981
from mapping_private_tpu.features.rsd import (
    get_type,
    grsd20_from_types,
    rsd_radii,
)
from mapping_private_tpu.ops.normals import estimate_normals

VOXEL_SIZE = 0.01  # example_GRSD_CCHLAC.cpp:15
RSD_RADIUS = max(0.01, VOXEL_SIZE / 2 * float(np.sqrt(3)))  # tools.hpp:170


def voxelize_for_features(
    cloud: PointCloud, voxel_size: float = VOXEL_SIZE, dim_bucket: int = 8
) -> VoxelGrid:
    """PCL-compatible grid: origin at floor(min/leaf)*leaf, dims to max.

    dims round up to multiples of ``dim_bucket`` so XLA reuses one
    compilation across similar-sized clouds (a 24-view corpus otherwise
    triggers 24 recompiles); the extra voxels are empty and every
    downstream feature (C3-HLAC sums, GRSD transitions — out-of-grid and
    empty neighbors count identically) is invariant to them."""
    data = cloud.to_numpy()
    xyz = data["xyz"]
    mn = np.floor(xyz.min(0) / voxel_size) * voxel_size
    dims = (
        np.floor(xyz.max(0) / voxel_size) - np.floor(xyz.min(0) / voxel_size)
    ).astype(int) + 1
    if dim_bucket > 1:
        dims = -(-dims // dim_bucket) * dim_bucket
    return voxelize(
        cloud, voxel_size, jnp.asarray(mn, jnp.float32), tuple(int(d) for d in dims),
        channels=("r", "g", "b"),
    )


def voxel_types(
    cloud: PointCloud,
    grid: VoxelGrid,
    voxel_size: float = VOXEL_SIZE,
    k_normals: int = 16,
) -> jax.Array:
    """(X,Y,Z) int32 surface-type grid via per-voxel RSD.

    Normals are estimated on the full cloud (reference: radius 0.02,
    grsd_colorCHLAC_tools.hpp computeNormal), RSD per occupied voxel
    centroid against the full cloud (rsd radius tools.hpp:170)."""
    cloud_n = estimate_normals(cloud, k=k_normals)
    normals = cloud_n.channel("normal")

    # occupied-voxel centroids as queries
    cnt = jnp.maximum(grid.count, 1).astype(jnp.float32)
    occ = grid.occupancy()
    # voxel centers (centroid ≈ center is fine for RSD's radius query)
    dims = grid.dims
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dims[0]), jnp.arange(dims[1]), jnp.arange(dims[2]), indexing="ij"
    )
    centers = (
        jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(jnp.float32) + 0.5
    ) * grid.voxel_size + grid.origin
    occ_flat = occ.reshape(-1)

    # query normals: nearest cloud point's normal
    from mapping_private_tpu.ops.neighbors import knn_bruteforce

    idx, _ = knn_bruteforce(centers, cloud.padded_xyz(), cloud.mask, k=1)
    qn = normals[jnp.maximum(idx[:, 0], 0)]

    r_min, r_max = rsd_radii(
        centers,
        occ_flat,
        cloud.padded_xyz(),
        cloud.mask,
        normals,
        qn,
        radius=RSD_RADIUS,
    )
    types = get_type(r_min, r_max).reshape(dims)
    return types


def extract_grsd_cchlac(
    cloud: PointCloud,
    voxel_size: float = VOXEL_SIZE,
    thresholds: Tuple[int, int, int] = (127, 127, 127),
    legacy_zeroth_scale: bool = False,
) -> jax.Array:
    """(137,) = GRSD-20 ++ ColorCHLAC-117 — the golden-file format."""
    grid = voxelize_for_features(cloud, voxel_size)
    types = voxel_types(cloud, grid, voxel_size)
    g = grsd20_from_types(types, grid.occupancy())
    c = colorchlac117(grid, thresholds)
    if legacy_zeroth_scale:
        c = c.at[0:6].multiply(0.5).at[63:69].multiply(0.5)
    return jnp.concatenate([g, c])


def extract_colorchlac117(
    cloud: PointCloud,
    voxel_size: float = VOXEL_SIZE,
    thresholds: Tuple[int, int, int] = (127, 127, 127),
    legacy_zeroth_scale: bool = False,
) -> jax.Array:
    grid = voxelize_for_features(cloud, voxel_size)
    c = colorchlac117(grid, thresholds)
    if legacy_zeroth_scale:
        c = c.at[0:6].multiply(0.5).at[63:69].multiply(0.5)
    return c


def extract_colorchlac981(
    cloud: PointCloud,
    voxel_size: float = VOXEL_SIZE,
    thresholds: Tuple[int, int, int] = (127, 127, 127),
) -> jax.Array:
    grid = voxelize_for_features(cloud, voxel_size)
    return colorchlac981(grid, thresholds)

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
NORMALS_RADIUS = 0.02  # grsd_colorCHLAC_tools.h:28


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
    # accumulate xyz so per-voxel centroids (PCL VoxelGrid filter output,
    # the RSD query points) are recoverable via grid.mean("_xyz")
    cloud = cloud.with_channel("_xyz", cloud.padded_xyz())
    return voxelize(
        cloud, voxel_size, jnp.asarray(mn, jnp.float32), tuple(int(d) for d in dims),
        channels=("r", "g", "b", "_xyz"),
    )


def voxel_types(
    cloud: PointCloud,
    grid: VoxelGrid,
    voxel_size: float = VOXEL_SIZE,
    k_normals: int = 544,
    k_rsd: int = 192,
) -> jax.Array:
    """(X,Y,Z) int32 surface-type grid via per-voxel RSD — exact PCL
    parity (validated bit-exact against the reference's golden
    *_GRSD_CCHLAC.pcd corpus).

    Normals: radius search 0.02 on the full cloud (reference
    computeNormal, grsd_colorCHLAC_tools.hpp:157-186).  RSD: per occupied
    *voxel centroid* (PCL VoxelGrid filter output) against the full
    cloud, radius max(0.01, leaf/2·√3) (tools.hpp:165-186), exact
    ``computeRSD`` min/max-angle line-fit semantics (rsd_radii_pcl).

    ``k_normals``/``k_rsd`` cap the neighbor gathers; the defaults cover
    the densest neighborhoods of the bundled corpora."""
    from mapping_private_tpu.features.rsd import rsd_radii_pcl
    from mapping_private_tpu.ops.normals import estimate_normals_radius

    cloud_n = estimate_normals_radius(
        cloud, radius=NORMALS_RADIUS, k_cap=k_normals
    )
    normals = cloud_n.channel("normal")

    dims = grid.dims
    centroids = grid.mean("_xyz").reshape(-1, 3)
    occ_flat = grid.occupancy().reshape(-1)

    r_min, r_max = rsd_radii_pcl(
        centroids,
        occ_flat,
        cloud.padded_xyz(),
        cloud.mask,
        normals,
        radius=RSD_RADIUS,
        k=k_rsd,
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
    layout: str = "own",
) -> jax.Array:
    """981-dim rotation-variant C3-HLAC.  layout="reference" returns the
    reference's interleaved bin order (extractColorCHLACSignature981 /
    c3_hlac bit order) for artifact interop."""
    grid = voxelize_for_features(cloud, voxel_size)
    f = colorchlac981(grid, thresholds)
    if layout == "reference":
        from mapping_private_tpu.features.colorchlac import to_reference_layout_981

        f = to_reference_layout_981(f)
    return f

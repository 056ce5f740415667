"""RSD (Radius-based Surface Descriptor), GRSD-20 and VOSCH.

Re-design of:
- per-point RSD r_min/r_max (reference `LocalRadiusEstimation`,
  cloud_algos/src/radius_estimation.cpp:80-101, and pcl::RSDEstimation as
  used by extractGRSDSignature21,
  color_chlac/include/color_chlac/grsd_colorCHLAC_tools.hpp:165-186),
- voxel surface-type classification `get_type` (grsd_colorCHLAC_tools.hpp:104-126
  — thresholds copied exactly),
- GRSD-20: 6×6 surface-type transition counts over the 26-neighborhood,
  upper triangle, first 20 entries (the EMPTY–EMPTY corner is always 0
  and dropped; grsd_colorCHLAC_tools.hpp:262-289),
- VOSCH = concat(GRSD, ColorCHLAC117) (grsd_colorCHLAC_tools.h:124).

The per-point neighbor loops become one batched kNN + masked reductions;
the transition count becomes a one-hot type grid, 26 shifted adds, and a
single einsum.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mapping_private_tpu.core.voxelgrid import VoxelGrid
from mapping_private_tpu.features.colorchlac import colorchlac117, _shift
from mapping_private_tpu.ops.neighbors import knn_bruteforce

# surface types (grsd_colorCHLAC_tools.hpp:95-101)
NOISE, PLANE, CYLINDER, SPHERE, EDGE, EMPTY = 0, 1, 2, 3, 4, 5
NORMALIZE_GRSD = 20.0 / 26.0  # grsd_colorCHLAC_tools.h:32

# the 13 half-offsets (shared with colorchlac) plus their negatives = 26
from mapping_private_tpu.features.colorchlac import NEIGHBOR_OFFSETS_13

NEIGHBOR_OFFSETS_26 = NEIGHBOR_OFFSETS_13 + tuple(
    (-a, -b, -c) for (a, b, c) in NEIGHBOR_OFFSETS_13
)


def rsd_radii(
    query_xyz: jax.Array,
    query_mask: jax.Array,
    surface_xyz: jax.Array,
    surface_mask: jax.Array,
    surface_normals: jax.Array,
    query_normals: jax.Array,
    radius: float,
    k: int = 32,
    plane_radius: float = 0.2,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query (r_min, r_max) surface radius estimates.

    For each neighbor within ``radius``: α = angle(n_q, n_i), d = ‖p−q‖;
    a sphere of radius r gives d ≈ α·r, so each pair votes r = d/α.
    r_min/r_max are the extreme votes (clamped to plane_radius — the
    'infinite radius' plane case), matching pcl::RSDEstimation's
    min/max-of-ratio semantics used by the reference.
    """
    idx, sq = knn_bruteforce(query_xyz, surface_xyz, surface_mask, k=k)
    d = jnp.sqrt(jnp.maximum(sq, 1e-20))
    valid = (idx >= 0) & (sq <= radius * radius) & (d > 1e-6) & query_mask[:, None]
    ni = surface_normals[jnp.maximum(idx, 0)]  # (Q,k,3)
    cos_a = jnp.clip(jnp.abs(jnp.sum(query_normals[:, None, :] * ni, axis=-1)), 0.0, 1.0)
    alpha = jnp.arccos(cos_a)  # [0, π/2]
    r_vote = d / jnp.maximum(alpha, 1e-3)  # α→0 ⇒ plane ⇒ huge r, clamped below
    r_vote = jnp.clip(r_vote, 0.0, plane_radius)
    big = jnp.float32(plane_radius)
    r_min = jnp.min(jnp.where(valid, r_vote, big), axis=1)
    r_max = jnp.max(jnp.where(valid, r_vote, 0.0), axis=1)
    any_valid = jnp.any(valid, axis=1)
    r_min = jnp.where(any_valid, r_min, 0.0)
    return r_min, r_max


def get_type(r_min: jax.Array, r_max: jax.Array) -> jax.Array:
    """Surface type per element — thresholds exactly as the reference
    (grsd_colorCHLAC_tools.hpp:104-126)."""
    return jnp.where(
        r_min > 0.100,
        PLANE,
        jnp.where(
            r_max > 0.175,
            CYLINDER,
            jnp.where(
                r_min < 0.015,
                NOISE,
                jnp.where(r_max - r_min < 0.050, SPHERE, EDGE),
            ),
        ),
    ).astype(jnp.int32)


_UPPER_TRI_6 = [(i, j) for i in range(6) for j in range(i, 6)]  # 21, last dropped


def grsd20_from_types(type_grid: jax.Array, occ: jax.Array, normalize: bool = False) -> jax.Array:
    """GRSD-20 from a (X,Y,Z) int32 type grid + occupancy.

    For each occupied voxel (source type s) and each of the 26 neighbor
    offsets: count (s, neighbor type or EMPTY).  Feature = upper triangle
    of the 6×6 count matrix, first 20 entries.
    """
    occf = occ.astype(jnp.float32)
    onehot = jax.nn.one_hot(type_grid, 6, dtype=jnp.float32) * occf[..., None]
    # neighbor channel vector: one-hot type if occupied, EMPTY otherwise.
    # Out-of-grid neighbors also count as EMPTY: the shifted empty
    # indicator must be 1 beyond the border, so build empty = 1 - occ and
    # add border contributions by construction: shift zero-pads, so
    # shifted (onehot + empty_onehot) loses border mass — instead compute
    # neighbor EMPTY as (1 - Σ shifted onehot channels).
    s_occ = [_shift(onehot, d) for d in NEIGHBOR_OFFSETS_26]
    M = jnp.zeros((6, 6), jnp.float32)
    for s in s_occ:
        M = M + jnp.einsum("xyzc,xyzd->cd", onehot, s)
    # EMPTY neighbors: 26 minus the number of occupied neighbors
    n_occupied_nbrs = sum(jnp.sum(s[..., :5], axis=-1) for s in s_occ)
    empty_counts = jnp.einsum(
        "xyzc,xyz->c", onehot, (26.0 - n_occupied_nbrs) * occf
    )
    M = M.at[:, EMPTY].add(empty_counts)
    feat = jnp.stack([M[i, j] for i, j in _UPPER_TRI_6])[:20]
    return feat * NORMALIZE_GRSD if normalize else feat


def vosch(
    grid: VoxelGrid,
    type_grid: jax.Array,
    thresholds: Tuple[int, int, int] = (127, 127, 127),
    normalize_grsd: bool = False,
) -> jax.Array:
    """VOSCH = concat(GRSD-20, ColorCHLAC-117) → (137,), the golden-file
    format of color_chlac/demos/shape_data/*_GRSD_CCHLAC.pcd."""
    g = grsd20_from_types(type_grid, grid.occupancy(), normalize=normalize_grsd)
    c = colorchlac117(grid, thresholds)
    return jnp.concatenate([g, c])

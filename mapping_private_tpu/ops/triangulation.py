"""Depth-image triangulation — the `DepthImageTriangulation` op.

The table-memory reconstruction chain requires this op
(dyn_obj_store/src/table_memory.cpp:20-25 includes
cloud_algos/depth_image_triangulation.h; registered in the algorithm pool
:277-280) but its source migrated out of the snapshot; this is the
standard organized-cloud formulation it implemented: each 2×2 pixel block
of an organized cloud yields up to two triangles, gated on all corners
being valid and on the triangle's max edge length (so depth
discontinuities don't get bridged).

The whole mesh is produced by array ops over the image lattice: corner
gathers, edge-length tests, and a mask — no per-pixel loop.  Returns a
fixed-capacity triangle list + validity mask (static shapes), with a host
helper to compact.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def triangulate_depth_image(
    points: jax.Array,  # (H, W, 3) organized cloud
    valid: jax.Array,  # (H, W)
    max_edge: float = 0.05,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (triangles (2·(H−1)·(W−1), 3) int32 flat-pixel ids,
    tri_valid (...,) bool)."""
    h, w = valid.shape
    ii, jj = jnp.meshgrid(jnp.arange(h - 1), jnp.arange(w - 1), indexing="ij")
    tl = ii * w + jj  # top-left flat index
    tr = tl + 1
    bl = tl + w
    br = bl + 1

    p = points.reshape(-1, 3)
    v = valid.reshape(-1)

    def edge_ok(a, b):
        d = jnp.linalg.norm(p[a] - p[b], axis=-1)
        return v[a] & v[b] & (d <= max_edge)

    # triangle 1: (tl, bl, tr); triangle 2: (tr, bl, br) — the standard
    # organized-mesh split
    t1_ok = edge_ok(tl, bl) & edge_ok(bl, tr) & edge_ok(tr, tl)
    t2_ok = edge_ok(tr, bl) & edge_ok(bl, br) & edge_ok(br, tr)
    t1 = jnp.stack([tl, bl, tr], axis=-1).reshape(-1, 3)
    t2 = jnp.stack([tr, bl, br], axis=-1).reshape(-1, 3)
    tris = jnp.concatenate([t1, t2], axis=0).astype(jnp.int32)
    ok = jnp.concatenate([t1_ok.reshape(-1), t2_ok.reshape(-1)])
    return tris, ok


def compact_mesh(
    points: np.ndarray, triangles: np.ndarray, tri_valid: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: drop invalid triangles and unused vertices.

    points: (H·W, 3) or (H, W, 3); returns (verts (V,3), tris (T,3))."""
    p = np.asarray(points, np.float32).reshape(-1, 3)
    t = np.asarray(triangles)[np.asarray(tri_valid)]
    used = np.unique(t)
    remap = np.full(len(p), -1, np.int64)
    remap[used] = np.arange(len(used))
    return p[used], remap[t]

"""Euclidean clustering — connected components by label propagation.

Replaces `cloud_geometry::nearest::extractEuclideanClusters` (used at
table_object_detector_passive.cpp:401,:477) and the BFS flood-fill in
`RegionGrowing::GrowFromPoint` (cloud_algos/src/region_growing.cpp:48-84).

The kd-tree BFS becomes: build a fixed-fanout radius graph (kNN edges
gated by tolerance), then iterate "label := min(label, neighbor labels)"
— both gather (incoming edges) and scatter-min (outgoing edges), so the
directed kNN graph acts undirected — inside a `lax.while_loop` until the
labeling is stationary.  Convergence takes O(graph diameter) sweeps; min
propagation doubles the reached distance per sweep along chains in
practice.  All shapes static.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mapping_private_tpu.ops.neighbors import knn_bruteforce, build_grid_hash, knn_grid


def radius_graph(
    xyz: jax.Array,
    mask: jax.Array,
    tolerance: float,
    k: int = 16,
    use_grid: bool = False,
    cap_per_cell: int = 16,
    normals: Optional[jax.Array] = None,
    angle_threshold: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(N,k) neighbor indices + validity for edges within ``tolerance``.

    If ``normals``/``angle_threshold`` are given, an edge additionally
    requires angle(n_i, n_j) < threshold (sign-agnostic) — the reference's
    region_angle_threshold semantics in extractEuclideanClusters when
    called with nx/ny/nz channel indices.
    """
    if use_grid:
        grid = build_grid_hash(xyz, mask, tolerance)
        idx, sq = knn_grid(
            grid, xyz, k=k, cap_per_cell=cap_per_cell,
            self_idx=jnp.arange(xyz.shape[0], dtype=jnp.int32),
        )
    else:
        idx, sq = knn_bruteforce(xyz, xyz, mask, k=k, exclude_self=True)
    valid = (idx >= 0) & (sq <= tolerance * tolerance) & mask[:, None]
    if normals is not None and angle_threshold is not None:
        nb = normals[jnp.maximum(idx, 0)]  # (N,k,3)
        cosang = jnp.abs(jnp.sum(normals[:, None, :] * nb, axis=-1))
        valid = valid & (cosang >= jnp.cos(angle_threshold))
    return idx, valid


def propagate_labels(
    init_labels: jax.Array,
    nbr_idx: jax.Array,
    nbr_valid: jax.Array,
    mask: jax.Array,
    max_iters: int = 200,
) -> jax.Array:
    """Min-label propagation to a fixed point.  Dead rows get label N."""
    n = init_labels.shape[0]
    dead = jnp.int32(n)
    labels0 = jnp.where(mask, init_labels, dead)
    idx = jnp.maximum(nbr_idx, 0)

    def body(state):
        labels, _, it = state
        nbr_lab = jnp.where(nbr_valid, labels[idx], dead)
        gathered = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
        # scatter-min along outgoing edges (padded via slot n)
        tgt = jnp.where(nbr_valid, idx, n)
        new = (
            jnp.full((n + 1,), dead, labels.dtype)
            .at[tgt.reshape(-1)]
            .min(jnp.broadcast_to(gathered[:, None], tgt.shape).reshape(-1))[:n]
        )
        new = jnp.minimum(gathered, new)
        new = jnp.where(mask, new, dead)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    return labels


def euclidean_cluster(
    xyz: jax.Array,
    mask: jax.Array,
    tolerance: float,
    k: int = 16,
    use_grid: bool = False,
    normals: Optional[jax.Array] = None,
    angle_threshold: Optional[float] = None,
) -> jax.Array:
    """Cluster labels (N,) int32; label = min point index in the component,
    dead rows get N."""
    idx, valid = radius_graph(
        xyz, mask, tolerance, k=k, use_grid=use_grid,
        normals=normals, angle_threshold=angle_threshold,
    )
    init = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    return propagate_labels(init, idx, valid, mask)


def cluster_sizes(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """(N,) size of the cluster each point belongs to (0 for dead)."""
    n = labels.shape[0]
    counts = jnp.zeros((n + 1,), jnp.int32).at[labels].add(mask.astype(jnp.int32))
    return jnp.where(mask, counts[jnp.clip(labels, 0, n)], 0)


def top_clusters(
    labels: jax.Array,
    mask: jax.Array,
    num_clusters: int,
    min_size: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Pick the ``num_clusters`` largest clusters.

    Returns:
      member: (num_clusters, N) bool membership masks (size-ordered desc).
      sizes: (num_clusters,) int32 (0 where fewer clusters exist).
    """
    n = labels.shape[0]
    counts = jnp.zeros((n + 1,), jnp.int32).at[labels].add(mask.astype(jnp.int32))
    counts = counts.at[n].set(0)  # dead bucket
    sizes, roots = jax.lax.top_k(counts, num_clusters)
    ok = sizes >= min_size
    member = (labels[None, :] == roots[:, None]) & mask[None, :] & ok[:, None]
    return member, jnp.where(ok, sizes, 0)

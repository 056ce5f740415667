"""Moving Least Squares surface smoothing — batched weighted polynomial fits.

The reference's `MovingLeastSquares` op is required by the table-memory
reconstruction chain (dyn_obj_store/src/table_memory.cpp:20-25 includes
cloud_algos/mls_fit.h; registered in the algorithm pool at :277-280) and by
the hough pipeline's smoothing stage (sequential_hough.cpp:1815-1860), but
its source migrated out of the snapshot — so this follows the classical
PCL MLS formulation the reference consumed:

per point: Gaussian-weighted neighborhood plane fit → local (u, v, n) frame
→ weighted order-2 bivariate polynomial height fit → project the point onto
the polynomial and re-derive the normal from its gradient.

Everything is one batched pass: kNN gather, closed-form 3×3 eigenvectors
for the plane, and a 6×6 normal-equations solve per point via the unrolled
Cholesky (no LAPACK loops inside jit).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mapping_private_tpu.core.cloud import PointCloud
from mapping_private_tpu.core.linalg import cholesky_solve_unrolled
from mapping_private_tpu.ops.neighbors import knn_bruteforce, build_grid_hash, knn_grid
from mapping_private_tpu.ops.normals import smallest_eigenvector_3x3


def _orthonormal_tangents(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., 3) unit normals → (u, v) spanning the tangent plane."""
    # pick the axis least aligned with n to seed u
    ax = jnp.where(
        jnp.abs(n[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
    )
    u = jnp.cross(n, ax)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = jnp.cross(n, u)
    return u, v


def mls_smooth(
    xyz: jax.Array,
    mask: jax.Array,
    search_radius: float = 0.03,
    k: int = 32,
    polynomial_order: int = 2,
    sqr_gauss_param: Optional[float] = None,
    use_grid: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MLS-projected positions, normals, and curvatures.

    Args:
      xyz: (N, 3); mask: (N,) live rows.
      search_radius: neighborhood radius; neighbors beyond it get ~0 weight.
      k: neighbor fan-out (static).
      polynomial_order: 0 (plane projection only) or 2 (full MLS).
      sqr_gauss_param: Gaussian weight scale; defaults to radius².

    Returns (new_xyz (N,3), normals (N,3), curvature (N,)).
    """
    if sqr_gauss_param is None:
        sqr_gauss_param = search_radius * search_radius
    n_pts = xyz.shape[0]
    if use_grid:
        grid = build_grid_hash(xyz, mask, search_radius)
        idx, sq = knn_grid(grid, xyz, k=k)
    else:
        idx, sq = knn_bruteforce(xyz, xyz, mask, k=k, exclude_self=False)
    valid = (idx >= 0) & mask[:, None]
    idx = jnp.maximum(idx, 0)
    pts = xyz[idx]  # (N, k, 3)
    w = jnp.where(valid, jnp.exp(-sq / sqr_gauss_param), 0.0)  # (N, k)

    # --- weighted plane fit -------------------------------------------------
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)  # (N,1)
    mean = jnp.sum(pts * w[..., None], axis=1) / wsum  # (N,3)
    d = (pts - mean[:, None, :]) * jnp.sqrt(w)[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d) / wsum[..., None]
    ev, nrm = smallest_eigenvector_3x3(cov)
    lam_sum = jnp.maximum(jnp.sum(ev, axis=-1), 1e-30)
    curvature = jnp.maximum(ev[..., 0], 0.0) / lam_sum

    # orient normals consistently toward origin (sensor at 0, PCL default)
    flip = jnp.sign(jnp.sum(nrm * (-xyz), axis=-1, keepdims=True))
    nrm = nrm * jnp.where(flip == 0, 1.0, flip)

    # project query onto the plane
    dist = jnp.sum((xyz - mean) * nrm, axis=-1, keepdims=True)  # (N,1)
    plane_pt = xyz - dist * nrm

    if polynomial_order < 2:
        new_xyz = jnp.where(mask[:, None], plane_pt, xyz)
        return new_xyz, nrm, curvature

    # --- order-2 polynomial height fit in the local frame -------------------
    u_ax, v_ax = _orthonormal_tangents(nrm)  # (N,3) each
    rel = pts - plane_pt[:, None, :]  # (N,k,3)
    ui = jnp.einsum("nkc,nc->nk", rel, u_ax)
    vi = jnp.einsum("nkc,nc->nk", rel, v_ax)
    hi = jnp.einsum("nkc,nc->nk", rel, nrm)
    # monomial basis [1, u, v, u², uv, v²]
    basis = jnp.stack(
        [jnp.ones_like(ui), ui, vi, ui * ui, ui * vi, vi * vi], axis=-1
    )  # (N,k,6)
    bw = basis * w[..., None]
    H = jnp.einsum("nki,nkj->nij", bw, basis)  # (N,6,6)
    g = jnp.einsum("nki,nk->ni", bw, hi)  # (N,6)
    coef = jax.vmap(lambda Hm, gv: cholesky_solve_unrolled(Hm, gv, jitter=1e-9))(
        H, g
    )  # (N,6)

    # query point sits at (u, v) = (0, 0): height = c0; gradient = (c1, c2)
    c0, c1, c2 = coef[:, 0], coef[:, 1], coef[:, 2]
    new_pt = plane_pt + c0[:, None] * nrm
    new_nrm = (
        nrm - c1[:, None] * u_ax - c2[:, None] * v_ax
    )
    new_nrm = new_nrm / jnp.maximum(
        jnp.linalg.norm(new_nrm, axis=-1, keepdims=True), 1e-12
    )
    # degenerate neighborhoods (wsum ~ weight of self only) keep the input
    ok = (jnp.sum(valid, axis=1) >= 6) & mask
    new_xyz = jnp.where(ok[:, None], new_pt, xyz)
    out_nrm = jnp.where(ok[:, None], new_nrm, nrm)
    return new_xyz, out_nrm, curvature


def mls(cloud: PointCloud, **kwargs) -> PointCloud:
    """PointCloud wrapper: smooths xyz, attaches normal/curvature channels."""
    new_xyz, nrm, curv = mls_smooth(cloud.padded_xyz(), cloud.mask, **kwargs)
    return (
        cloud.with_xyz(jnp.where(cloud.mask[:, None], new_xyz, cloud.xyz))
        .with_channel("normal", nrm)
        .with_channel("curvature", curv)
    )

"""Organized-cloud table detector — `table_object_detector_sr` counterpart.

The reference's SwissRanger variant (cloud_tools/src/
table_object_detector_sr.cpp:1-482) works on ORGANIZED range images
(176×144, :72-73) instead of unordered clouds: organized-neighborhood
normal estimation with jump-edge filtering
(`computeOrganizedPointCloudNormalsWithFiltering`, :254), z-parallel
normal selection (:259), one RANSAC plane (:264), a jump-edge filter
pass over the full-resolution cloud (`filterJumpEdges`, :269), plane
refinement by point-to-plane distance (:272-280), 2-D hull of the
downsampled inliers (:287), and object clusters supported by the table
(`findObjectClusters`, :340+).  The filtering kernels live in the
external point_cloud_mapping library (not in the snapshot); their
semantics — remove points whose viewpoint ray is nearly parallel to the
segment toward an image neighbor (angle < min_angle or > max_angle,
params :156-157), and exclude neighbors with depth gaps > k_max_z from
normal windows (:137) — are reimplemented here as dense shifted-window
image ops (one (2k+1)² shift loop, no per-pixel searches).

`split_table_detection` is the `table_msg_split.cpp:1-115` counterpart
(table polygon + one cloud per object cluster).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.cloud import PointCloud
from mapping_private_tpu.fit.ransac import fit_plane_ransac
from mapping_private_tpu.ops.cluster import euclidean_cluster, top_clusters
from mapping_private_tpu.ops.hull import radial_hull, in_radial_hull
from mapping_private_tpu.ops.normals import smallest_eigenvector_3x3


def _shift2d(a: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift an image so out-of-bounds reads become zeros (unlike roll)."""
    out = jnp.roll(a, (dy, dx), axis=(0, 1))
    H, W = a.shape[0], a.shape[1]
    ys = jnp.arange(H) - dy
    xs = jnp.arange(W) - dx
    oky = (ys >= 0) & (ys < H)
    okx = (xs >= 0) & (xs < W)
    ok = oky[:, None] & okx[None, :]
    return jnp.where(ok.reshape(ok.shape + (1,) * (a.ndim - 2)), out, 0)


def jump_edge_keep_mask(
    points: jax.Array,   # (H, W, 3)
    valid: jax.Array,    # (H, W)
    viewpoint: jax.Array,  # (3,)
    min_angle_deg: float = 10.0,
    max_angle_deg: float = 170.0,
    step: int = 1,
) -> jax.Array:
    """True where a point is NOT a jump edge (`filterJumpEdges`
    semantics): for each of the 4 image neighbors at ``step``, the angle
    between the viewpoint ray and the segment to the neighbor must stay
    inside [min_angle, max_angle] — a segment nearly parallel to the
    line of sight is a depth discontinuity, not surface."""
    ray = points - viewpoint[None, None, :]
    rn = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    cmin = jnp.cos(jnp.deg2rad(min_angle_deg))
    cmax = jnp.cos(jnp.deg2rad(max_angle_deg))
    keep = valid
    for dy, dx in ((0, step), (0, -step), (step, 0), (-step, 0)):
        nb = _shift2d(points, dy, dx)
        nb_ok = _shift2d(valid[..., None], dy, dx)[..., 0].astype(bool)
        seg = nb - points
        sn = jnp.linalg.norm(seg, axis=-1, keepdims=True)
        c = jnp.sum(ray * seg, -1) / jnp.maximum(rn[..., 0] * sn[..., 0],
                                                 1e-12)
        # angle < min (c > cos(min)) or angle > max (c < cos(max))
        edge = nb_ok & ((c > cmin) | (c < cmax)) & (sn[..., 0] > 1e-9)
        keep = keep & ~edge
    return keep


def organized_normals_filtered(
    points: jax.Array,   # (H, W, 3)
    valid: jax.Array,    # (H, W)
    viewpoint: jax.Array,
    k: int = 2,
    max_z: float = 0.03,
    min_angle_deg: float = 10.0,
    max_angle_deg: float = 170.0,
) -> Tuple[jax.Array, jax.Array]:
    """Windowed-PCA normals over the organized grid with filtering
    (`computeOrganizedPointCloudNormalsWithFiltering`): neighbors beyond
    a ``max_z`` depth gap are excluded from each window, jump-edge
    pixels are excluded entirely, normals orient toward the viewpoint.

    Returns (normals (H,W,3), ok (H,W))."""
    keep = jump_edge_keep_mask(
        points, valid, viewpoint, min_angle_deg, max_angle_deg)
    w0 = keep.astype(points.dtype)
    z = points[..., 2]
    S0 = jnp.zeros_like(w0)
    S1 = jnp.zeros_like(points)
    S2 = jnp.zeros(points.shape[:2] + (3, 3), points.dtype)
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            nb = _shift2d(points, dy, dx)
            wn = _shift2d(w0[..., None], dy, dx)[..., 0]
            wn = wn * (jnp.abs(nb[..., 2] - z) <= max_z)
            S0 = S0 + wn
            S1 = S1 + nb * wn[..., None]
            S2 = S2 + (nb[..., :, None] * nb[..., None, :]
                       ) * wn[..., None, None]
    n_ok = S0 >= 3
    cnt = jnp.maximum(S0, 1.0)
    mean = S1 / cnt[..., None]
    cov = S2 / cnt[..., None, None] - mean[..., :, None] * mean[..., None, :]
    _evals, vec = smallest_eigenvector_3x3(cov.reshape(-1, 3, 3))
    nrm = vec.reshape(points.shape)
    # orient toward the viewpoint
    to_vp = viewpoint[None, None, :] - points
    flip = jnp.where(jnp.sum(nrm * to_vp, -1, keepdims=True) < 0, -1.0, 1.0)
    nrm = nrm * flip
    ok = keep & n_ok
    return jnp.where(ok[..., None], nrm, 0.0), ok


@dataclasses.dataclass(frozen=True)
class SRDetectorConfig:
    """Defaults = the reference's parameter-server defaults
    (table_object_detector_sr.cpp:135-163)."""
    downsample_factor: int = 4       # :135
    k_neighbors: int = 2             # search_k_closest window radius :136
    max_z: float = 0.03              # k_max_z :137
    eps_angle: float = 15.0          # degrees :139
    min_angle: float = 10.0          # filtering_min_angle :156
    max_angle: float = 170.0         # filtering_max_angle :157
    sac_distance_threshold: float = 0.03  # :163
    sac_hypotheses: int = 256
    object_cluster_tolerance: float = 0.07  # :142
    object_cluster_min_pts: int = 30        # :143
    delta_z: float = 0.05                   # :145
    object_min_distance_from_table: float = 0.10  # :146
    min_table_inliers: int = 50
    max_objects: int = 8
    hull_bins: int = 72
    cluster_knn: int = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SRPlaneClusters:
    """GetPlaneClusters.srv-shaped result (plane equation + object
    clusters; mapping_srvs/srv/GetPlaneClusters.srv)."""
    found: jax.Array          # () bool
    plane: jax.Array          # (4,) [n, d], n_z >= 0
    table_inliers: jax.Array  # (H, W) bool, full resolution
    keep_mask: jax.Array      # (H, W) bool — jump-edge filter result
    table_min: jax.Array      # (3,)
    table_max: jax.Array      # (3,)
    object_masks: jax.Array   # (O, H*W) bool over the flattened image
    object_sizes: jax.Array   # (O,) int32
    object_centers: jax.Array  # (O, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_table_sr(
    points: jax.Array,    # (H, W, 3) organized cloud, z-up frame
    valid: jax.Array,     # (H, W)
    viewpoint: jax.Array,  # (3,) sensor origin in the same frame
    key: jax.Array,
    cfg: SRDetectorConfig = SRDetectorConfig(),
) -> SRPlaneClusters:
    """The detectTable pipeline (table_object_detector_sr.cpp:196-340)."""
    f = cfg.downsample_factor
    # 1. filtered organized normals, downsampled (:254)
    nrm, n_ok = organized_normals_filtered(
        points, valid, viewpoint, k=cfg.k_neighbors, max_z=cfg.max_z,
        min_angle_deg=cfg.min_angle, max_angle_deg=cfg.max_angle)
    dpts = points[::f, ::f].reshape(-1, 3)
    dnrm = nrm[::f, ::f].reshape(-1, 3)
    dok = n_ok[::f, ::f].reshape(-1)

    # 2. z-parallel normal selection (:259)
    z_par = jnp.abs(dnrm[:, 2]) >= jnp.cos(jnp.deg2rad(cfg.eps_angle))
    sel = dok & z_par

    # 3. RANSAC plane on the selected downsampled points (:264)
    plane, inl_down = fit_plane_ransac(
        dpts, sel, key, num_hypotheses=cfg.sac_hypotheses,
        threshold=cfg.sac_distance_threshold)
    flip = jnp.sign(plane[2])
    plane = plane * jnp.where(flip == 0, 1.0, flip)
    found = jnp.sum(inl_down.astype(jnp.int32)) >= cfg.min_table_inliers

    # 4. jump-edge filter over the FULL cloud (:269), plane refinement
    #    by raw distance (:272-280)
    keep = jump_edge_keep_mask(
        points, valid, viewpoint, cfg.min_angle, cfg.max_angle)
    flat = points.reshape(-1, 3)
    kflat = keep.reshape(-1)
    dist = flat @ plane[:3] + plane[3]
    table_full = kflat & (jnp.abs(dist) < cfg.sac_distance_threshold)

    # 5. hull of the DOWNSAMPLED inliers (:287 uses cloud_down_)
    hull = radial_hull(dpts[:, :2], inl_down, num_bins=cfg.hull_bins)
    big = jnp.float32(1e8)
    t_min = jnp.min(jnp.where(table_full[:, None], flat, big), axis=0)
    t_max = jnp.max(jnp.where(table_full[:, None], flat, -big), axis=0)

    # 6. object clusters above the table (findObjectClusters :340+)
    above = (
        kflat
        & (flat[:, 0] > t_min[0]) & (flat[:, 0] < t_max[0])
        & (flat[:, 1] > t_min[1]) & (flat[:, 1] < t_max[1])
        & (flat @ plane[:3] + plane[3] > cfg.delta_z)
    )
    proj = flat - (flat @ plane[:3] + plane[3])[:, None] * plane[:3][None, :]
    above = above & in_radial_hull(hull, proj[:, :2])
    labels = euclidean_cluster(
        flat, above, cfg.object_cluster_tolerance, k=cfg.cluster_knn)
    obj_masks, obj_sizes = top_clusters(
        labels, above, cfg.max_objects, min_size=cfg.object_cluster_min_pts)

    def obj_stats(memb):
        w = memb.astype(jnp.float32)[:, None]
        c = jnp.sum(flat * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        zmin = jnp.min(jnp.where(memb, flat[:, 2], big))
        return c, zmin

    obj_centers, obj_zmin = jax.vmap(obj_stats)(obj_masks)
    supported = obj_zmin <= t_max[2] + cfg.object_min_distance_from_table
    kept = supported & (obj_sizes > 0) & found
    obj_masks = obj_masks & kept[:, None]
    obj_sizes = jnp.where(kept, obj_sizes, 0)

    return SRPlaneClusters(
        found=found, plane=plane,
        table_inliers=(table_full & found).reshape(points.shape[:2]),
        keep_mask=keep, table_min=t_min, table_max=t_max,
        object_masks=obj_masks, object_sizes=obj_sizes,
        object_centers=obj_centers,
    )


def split_table_detection(
    det: SRPlaneClusters,
    points: jax.Array,  # (H, W, 3) the same organized cloud
) -> Tuple[np.ndarray, List[PointCloud]]:
    """`table_msg_split.cpp` counterpart: a TableWithObjects-shaped
    result splits into the table polygon and one PointCloud per object
    cluster (the node republishes table->table as a PolygonStamped and
    each objects[i].points as its own cloud, :81-95)."""
    flat = np.asarray(points).reshape(-1, 3)
    tmask = np.asarray(det.table_inliers).reshape(-1)
    table_pts = flat[tmask]
    # polygon: xy hull vertices of the table inliers (convex, CCW)
    if len(table_pts):
        from scipy.spatial import ConvexHull  # host-side utility

        try:
            h = ConvexHull(table_pts[:, :2])
            poly = table_pts[h.vertices][:, :2]
        except Exception:
            poly = table_pts[:1, :2]
    else:
        poly = np.zeros((0, 2), np.float32)
    clouds = []
    for m, sz in zip(np.asarray(det.object_masks),
                     np.asarray(det.object_sizes)):
        if sz > 0:
            clouds.append(PointCloud.from_numpy(flat[m]))
    return poly, clouds

"""Organized-cloud SR table detector (models/table_detector_sr.py —
table_object_detector_sr.cpp counterpart): jump-edge semantics on a
synthetic organized depth grid with real discontinuities, filtered
organized normals, the full detect pipeline, and the table_msg_split
counterpart."""
import numpy as np
import jax
import jax.numpy as jnp

from mapping_private_tpu.models.table_detector_sr import (
    SRDetectorConfig,
    detect_table_sr,
    jump_edge_keep_mask,
    organized_normals_filtered,
    split_table_detection,
)

H, W = 64, 64
# oblique camera (an SR on a robot head): sees the box SIDES, so object
# clusters reach down to the table and the silhouette is a real
# foreground/background depth discontinuity
VP = np.array([-0.7, 0.0, 1.7], np.float32)
TABLE_Z = 0.75
BOX_LO = np.array([0.05, -0.20, TABLE_Z])
BOX_HI = np.array([0.45, 0.20, 0.95])  # 20 cm box


def _organized_scene():
    """Pinhole rays from VP through a grid: nearest hit of an
    axis-aligned box (slab test) or the table plane.  Every ray hits the
    table (steep downward look), so the image is fully valid."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    look = np.array([0.25, 0.0, TABLE_Z]) - VP
    look /= np.linalg.norm(look)
    right = np.cross(look, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, look)
    u = (xs - W / 2) / (W * 1.6)
    v = (ys - H / 2) / (H * 1.6)
    d = look + u[..., None] * right + v[..., None] * up
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    assert d[..., 2].max() < -0.1  # all rays point down → finite hits
    t_tab = (TABLE_Z - VP[2]) / d[..., 2]
    # box hit (slab method)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (BOX_LO - VP) / d
        t2 = (BOX_HI - VP) / d
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    t_box = np.where((tmax >= tmin) & (tmin > 0), tmin, np.inf)
    in_box = t_box < t_tab
    t = np.where(in_box, t_box, t_tab)
    pts = VP + t[..., None] * d
    pts += np.random.default_rng(0).normal(0, 5e-4, pts.shape)
    return pts.astype(np.float32), in_box


def _range_jump_masks(pts, thresh_jump=0.08, thresh_smooth=0.02):
    """(jump ring, smooth region) from neighbor range discontinuities —
    independent of the implementation under test."""
    rng_im = np.linalg.norm(pts - VP, axis=-1)
    diff = np.zeros((H, W))
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        d = np.abs(np.roll(rng_im, (dy, dx), (0, 1)) - rng_im)
        # invalidate wrap-around reads
        if dy:
            d[0 if dy > 0 else -1, :] = 0
        if dx:
            d[:, 0 if dx > 0 else -1] = 0
        diff = np.maximum(diff, d)
    border = np.zeros((H, W), bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    return (diff > thresh_jump) & ~border, (diff < thresh_smooth) & ~border


class TestJumpEdges:
    def test_silhouette_flagged_interior_kept(self):
        pts, in_box = _organized_scene()
        keep = np.asarray(jump_edge_keep_mask(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP)))
        jump, smooth = _range_jump_masks(pts)
        assert jump.sum() > 30  # the scene really has a silhouette
        # depth discontinuities are excluded, smooth surface survives
        assert keep[jump].mean() < 0.25, "jump edges not flagged"
        assert keep[smooth].mean() > 0.97

    def test_flat_scene_keeps_everything(self):
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pts = np.stack([xs * 0.01, ys * 0.01,
                        np.full((H, W), TABLE_Z)], -1).astype(np.float32)
        keep = np.asarray(jump_edge_keep_mask(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP)))
        assert keep.mean() > 0.999


def _erode(mask, it=1):
    out = mask.copy()
    for _ in range(it):
        nxt = out.copy()
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nxt &= np.roll(out, (dy, dx), (0, 1))
        out = nxt
    return out


class TestOrganizedNormals:
    def test_table_normals_up_and_edges_excluded(self):
        pts, in_box = _organized_scene()
        nrm, ok = organized_normals_filtered(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP))
        nrm, ok = np.asarray(nrm), np.asarray(ok)
        jump, smooth = _range_jump_masks(pts)
        table_smooth = _erode(~in_box & smooth, 3)
        assert table_smooth.sum() > 200
        assert ok[table_smooth].mean() > 0.9
        sel = table_smooth & ok
        # normals of the table point up (+z, toward the viewpoint)
        assert (nrm[sel][:, 2] > 0.99).mean() > 0.99
        # jump-edge pixels carry no normal
        assert ok[jump].mean() < 0.25

    def test_depth_gap_neighbors_excluded(self):
        """max_z filtering: surviving pixels near the discontinuity keep
        clean normals because across-the-gap neighbors are excluded from
        their windows (box-top normals stay vertical near the edge)."""
        pts, in_box = _organized_scene()
        nrm, ok = organized_normals_filtered(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP))
        nrm, ok = np.asarray(nrm), np.asarray(ok)
        top = in_box & (pts[..., 2] > BOX_HI[2] - 0.01)
        near_edge = top & ~_erode(top, 3)
        sel = near_edge & ok
        if sel.any():
            assert (np.abs(nrm[sel][:, 2]) > 0.9).mean() > 0.85


class TestDetectSR:
    def test_full_pipeline(self):
        pts, in_box = _organized_scene()
        cfg = SRDetectorConfig(min_table_inliers=30,
                               object_cluster_min_pts=20)
        det = detect_table_sr(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP),
            jax.random.PRNGKey(0), cfg)
        assert bool(det.found)
        plane = np.asarray(det.plane)
        # z = TABLE_Z plane: n ≈ (0,0,1), d ≈ −TABLE_Z
        assert plane[2] > 0.999
        assert abs(-plane[3] / plane[2] - TABLE_Z) < 0.01
        # the box comes out as one supported object cluster of box pixels
        sizes = np.asarray(det.object_sizes)
        assert (sizes > 0).sum() == 1
        m = np.asarray(det.object_masks)[np.argmax(sizes)].reshape(H, W)
        assert m[in_box].sum() == m.sum()  # only box pixels
        assert m.sum() > 100
        c = np.asarray(det.object_centers)[np.argmax(sizes)]
        # cluster = box top + visible sides above delta_z
        assert TABLE_Z + 0.05 < c[2] < BOX_HI[2]
        assert BOX_LO[0] - 0.02 < c[0] < BOX_HI[0] + 0.02
        # table inliers cover the table; box pixels only qualify where
        # the sides pass within the 3 cm plane band (the reference's
        # refine step has the same property, :272-280)
        ti = np.asarray(det.table_inliers)
        assert ti[~in_box].mean() > 0.7
        assert ti[in_box & (pts[..., 2] > TABLE_Z + 0.05)].mean() == 0.0

    def test_msg_split(self):
        pts, in_box = _organized_scene()
        cfg = SRDetectorConfig(min_table_inliers=30,
                               object_cluster_min_pts=20)
        det = detect_table_sr(
            jnp.asarray(pts), jnp.ones((H, W), bool), jnp.asarray(VP),
            jax.random.PRNGKey(0), cfg)
        poly, clouds = split_table_detection(det, jnp.asarray(pts))
        assert len(clouds) == 1
        assert int(clouds[0].mask.sum()) == int(det.object_sizes.max())
        # polygon is a sane xy hull around the table footprint
        assert poly.shape[0] >= 3
        assert poly[:, 0].max() - poly[:, 0].min() > 0.3

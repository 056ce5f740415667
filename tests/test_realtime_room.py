"""Tests for realtime (depth/render/segmentation) and room segmentation."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.realtime import (
    background_subtract,
    connected_components_image,
    depth_to_cloud,
    fast_normals_image,
    mean_shift_normals,
    multi_plane_ransac,
    render_depth_mesh,
    segment_normal_image,
    smooth_depth_image,
)
from mapping_private_tpu.models.room_segmentation import (
    RoomSegmentationConfig,
    segment_room,
    wall_filter,
    FLOOR,
    CEILING,
)


def _two_plane_depth(h=48, w=64):
    """Organized scene: left half wall at 2m, right half slanted plane."""
    depth = np.zeros((h, w), np.float32)
    depth[:, : w // 2] = 2.0
    for u in range(w // 2, w):
        depth[:, u] = 1.0 + 0.01 * (u - w // 2)
    return depth


class TestDepthOps:
    def test_unproject_roundtrip(self):
        depth = _two_plane_depth()
        pts, valid = depth_to_cloud(jnp.asarray(depth), fx=100, fy=100)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(pts[..., 2]), depth, atol=1e-6)
        # center pixel maps to the optical axis
        cy, cx = depth.shape[0] // 2, depth.shape[1] // 2

    def test_smoothing_reduces_noise_keeps_edges(self):
        rng = np.random.default_rng(0)
        depth = _two_plane_depth()
        noisy = depth + rng.normal(0, 0.004, depth.shape).astype(np.float32)
        noisy[10, 10] = 0.0  # invalid pixel
        sm = np.asarray(smooth_depth_image(jnp.asarray(noisy), iterations=5))
        assert sm[10, 10] == 0.0  # invalid preserved
        # noise on the flat wall reduced
        wall = np.s_[5:40, 5:25]
        assert np.abs(sm[wall] - 2.0).mean() < np.abs(noisy[wall] - 2.0).mean()
        # depth edge at the half boundary not smeared across
        assert abs(sm[24, 31] - noisy[24, 31]) < 0.5

    def test_background_subtract(self):
        meas = jnp.asarray(_two_plane_depth())
        rendered = jnp.zeros_like(meas)
        # robot arm covers a block at 1.9m — closer than the 2m wall
        rendered = rendered.at[10:20, 5:15].set(1.9)
        keep = np.asarray(background_subtract(meas, rendered, threshold=0.2))
        assert not keep[12, 8]  # wall pixel behind robot within thresh → cut
        assert keep[30, 8]  # outside robot → kept


class TestRender:
    def test_renders_triangle_depth(self):
        # a big triangle at z=2 facing the camera
        verts = np.array([[-1, -1, 2.0], [1, -1, 2.0], [0, 1.5, 2.0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        d = np.asarray(render_depth_mesh(verts, tris, (48, 64), fx=30, fy=30))
        ch, cw = 24, 32
        assert abs(d[ch, cw] - 2.0) < 1e-3  # center covered at z=2
        assert d[0, 0] == 0.0  # corner not covered

    def test_zbuffer_near_wins(self):
        verts = np.array([
            [-1, -1, 2.0], [1, -1, 2.0], [0, 1.5, 2.0],   # far
            [-1, -1, 1.0], [1, -1, 1.0], [0, 1.5, 1.0],   # near
        ], np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        d = np.asarray(render_depth_mesh(verts, tris, (48, 64), fx=30, fy=30))
        assert abs(d[24, 32] - 1.0) < 1e-3


class TestRealtimeSegmentation:
    def test_fast_normals(self):
        depth = jnp.full((32, 32), 1.5, jnp.float32)
        pts, valid = depth_to_cloud(depth, fx=100, fy=100)
        n = np.asarray(fast_normals_image(pts, valid))
        inner = n[2:-2, 2:-2]
        assert np.abs(inner[..., 2]).mean() > 0.99  # flat wall ⇒ ±z normals

    def test_multi_plane_ransac_two_planes(self):
        depth = _two_plane_depth()
        pts, valid = depth_to_cloud(jnp.asarray(depth), fx=100, fy=100)
        n = fast_normals_image(pts, valid)
        flat_p = pts.reshape(-1, 3)
        flat_n = n.reshape(-1, 3)
        ok = valid.reshape(-1) & (jnp.linalg.norm(flat_n, axis=-1) > 0.5)
        planes, labels, count = multi_plane_ransac(
            flat_p, flat_n, ok, jax.random.PRNGKey(0),
            max_planes=4, threshold=0.02, min_coverage=0.95,
        )
        assert int(count) >= 2
        lab = np.asarray(labels).reshape(depth.shape)
        # left wall is one plane, slanted right side another
        left = lab[10:40, 5:25]
        right = lab[10:40, 40:60]
        assert (left >= 0).mean() > 0.9
        assert (right >= 0).mean() > 0.9
        assert np.bincount(left[left >= 0]).argmax() != \
               np.bincount(right[right >= 0]).argmax()

    def test_connected_components(self):
        valid = jnp.ones((8, 8), bool)
        adj = jnp.ones((8, 8, 4), bool)
        # cut the image into top/bottom halves
        adj = adj.at[4, :, 0].set(False)  # row 4 doesn't connect up
        adj = adj.at[3, :, 1].set(False)  # row 3 doesn't connect down
        lab = np.asarray(connected_components_image(adj, valid))
        assert len(np.unique(lab[:4])) == 1
        assert len(np.unique(lab[4:])) == 1
        assert lab[0, 0] != lab[7, 7]

    def test_segment_normal_image(self):
        depth = _two_plane_depth()
        pts, valid = depth_to_cloud(jnp.asarray(depth), fx=100, fy=100)
        n = fast_normals_image(pts, valid)
        ok = valid & (jnp.linalg.norm(n, axis=-1) > 0.5)
        seg = np.asarray(segment_normal_image(n, ok, range_bandwidth=0.2))
        left_ids = seg[10:40, 5:25].ravel()
        right_ids = seg[10:40, 45:60].ravel()
        hw = seg.shape[0] * seg.shape[1]
        l_mode = np.bincount(left_ids[left_ids < hw]).argmax()
        r_mode = np.bincount(right_ids[right_ids < hw]).argmax()
        assert l_mode != r_mode


class TestRoomSegmentation:
    def _room(self, seed=0):
        rng = np.random.default_rng(seed)
        floor = np.column_stack([rng.uniform(0, 4, 800), rng.uniform(0, 4, 800),
                                 np.zeros(800)])
        ceil = np.column_stack([rng.uniform(0, 4, 800), rng.uniform(0, 4, 800),
                                np.full(800, 3.0)])
        wall_x = np.column_stack([np.zeros(800), rng.uniform(0, 4, 800),
                                  rng.uniform(0.2, 2.6, 800)])
        wall_y = np.column_stack([rng.uniform(0, 4, 800), np.zeros(800),
                                  rng.uniform(0.2, 2.6, 800)])
        return (np.vstack([floor, ceil, wall_x, wall_y]).astype(np.float32),
                800)

    def test_labels(self):
        pts, n = self._room()
        cloud = PointCloud.from_numpy(pts)
        seg = segment_room(cloud, jax.random.PRNGKey(0))
        lab = np.asarray(seg.labels)
        assert (lab[:n] == FLOOR).mean() > 0.95
        assert (lab[n:2*n] == CEILING).mean() > 0.95
        assert (lab[2*n:3*n] >= 3).mean() > 0.9  # walls
        assert (lab[3*n:4*n] >= 3).mean() > 0.9
        assert len(seg.wall_planes) >= 2

    def test_wall_filter(self):
        pts, n = self._room(1)
        cloud = PointCloud.from_numpy(pts)
        out = wall_filter(cloud, jax.random.PRNGKey(1))
        kept = np.asarray(out.mask)
        # wall points dropped, floor/ceiling intact
        assert kept[2*n:4*n].mean() < 0.1
        assert kept[:2*n].mean() > 0.9


class TestRoomSegmentApp:
    def test_cli(self, tmp_path, capsys):
        import json
        from mapping_private_tpu.io.pcd import save_pcd
        from mapping_private_tpu.apps.room_segment import main

        rng = np.random.default_rng(9)
        floor = np.column_stack([rng.uniform(0, 3, 600), rng.uniform(0, 3, 600),
                                 np.zeros(600)])
        wall = np.column_stack([np.zeros(600), rng.uniform(0, 3, 600),
                                rng.uniform(0.2, 2.5, 600)])
        pts = np.vstack([floor, wall]).astype(np.float32)
        p = str(tmp_path / "room.pcd")
        save_pcd(p, {"xyz": pts})
        out_f = str(tmp_path / "nowalls.pcd")
        rc = main([p, "--out-filtered", out_f])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["counts"]["floor"] > 500
        assert out["counts"]["walls"] > 500
        assert len(out["wall_planes"]) >= 1
        import os
        assert os.path.exists(out_f)

"""Tests for sequential Hough-voting segmentation."""
import jax
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.models.hough_segmentation import (
    HoughConfig,
    hough_segment,
)


def _tabletop_scene(seed=0):
    """A box and a cylinder standing on z=0 (side-view points: walls only)."""
    rng = np.random.default_rng(seed)
    # cuboid: 0.2 x 0.12 footprint at (0.3, 0.2), height 0.18; sample walls
    n_wall = 700
    t = rng.uniform(0, 1, n_wall)
    side = rng.integers(0, 4, n_wall)
    x = np.where(side == 0, 0.3 + t * 0.2,
        np.where(side == 1, 0.3 + t * 0.2,
        np.where(side == 2, 0.3, 0.5)))
    y = np.where(side == 0, 0.2,
        np.where(side == 1, 0.32,
        np.where(side == 2, 0.2 + t * 0.12, 0.2 + t * 0.12)))
    zb = rng.uniform(0.0, 0.18, n_wall)
    box_pts = np.column_stack([x, y, zb])

    # cylinder: r=0.04 at (0.8, 0.5), height 0.55 (tall)
    n_cyl = 600
    ang = rng.uniform(0, 2 * np.pi, n_cyl)
    zc = rng.uniform(0.0, 0.55, n_cyl)
    cyl_pts = np.column_stack([
        0.8 + 0.04 * np.cos(ang), 0.5 + 0.04 * np.sin(ang), zc
    ])
    pts = np.vstack([box_pts, cyl_pts]).astype(np.float32)
    pts[:, :2] += rng.normal(0, 0.0015, (len(pts), 2))
    return pts, n_wall, n_cyl


class TestHoughSegmentation:
    def test_extracts_box_and_cylinder(self):
        pts, n_wall, n_cyl = _tabletop_scene()
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=4, min_inliers=80)
        segs = hough_segment(cloud, jax.random.PRNGKey(0), cfg)
        assert len(segs) >= 2
        kinds = {s.kind for s in segs[:2]}
        assert kinds == {"cuboid", "cylinder"}

        cyl = next(s for s in segs if s.kind == "cylinder")
        center, r, zmin, zmax = cyl.cylinder
        np.testing.assert_allclose(center, [0.8, 0.5], atol=0.01)
        assert abs(r - 0.04) < 0.01
        assert cyl.size_class == "medium"  # 0.55 m: > medium_value, < tall_value
        # cylinder claims mostly cylinder points
        assert cyl.inliers[n_wall:n_wall + n_cyl].mean() > 0.9
        assert cyl.inliers[:n_wall].mean() < 0.05

        cub = next(s for s in segs if s.kind == "cuboid")
        e = np.sort(np.asarray(cub.box.extents))
        np.testing.assert_allclose(e, [0.12, 0.18, 0.2], atol=0.05)
        assert cub.size_class == "short"

    def test_segments_disjoint(self):
        pts, _, _ = _tabletop_scene(1)
        cloud = PointCloud.from_numpy(pts)
        segs = hough_segment(
            cloud, jax.random.PRNGKey(1), HoughConfig(max_objects=4, min_inliers=80)
        )
        total = np.zeros(cloud.capacity, int)
        for s in segs:
            total += s.inliers.astype(int)
        assert (total <= 1).all()

    def test_empty_cloud(self):
        cloud = PointCloud.from_numpy(np.zeros((0, 3), np.float32))
        segs = hough_segment(cloud, jax.random.PRNGKey(2))
        assert segs == []

"""Tests for layered 3-D reconstruction (the deprecated monolith's flow)."""
import jax
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.models.layered_reconstruction import (
    LayeredConfig,
    layered_reconstruction,
)


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    # a wall (vertical plane) spanning z 0..0.6 and a cylinder r=0.1
    n_wall = 1800
    wall = np.column_stack([
        rng.uniform(0, 1.2, n_wall), np.full(n_wall, 0.4),
        rng.uniform(0, 0.6, n_wall),
    ])
    n_cyl = 1500
    ang = rng.uniform(0, 2 * np.pi, n_cyl)
    cyl = np.column_stack([
        2.0 + 0.1 * np.cos(ang), 1.5 + 0.1 * np.sin(ang),
        rng.uniform(0, 0.5, n_cyl),
    ])
    pts = np.vstack([wall, cyl]).astype(np.float32)
    pts[:, :2] += rng.normal(0, 0.002, (len(pts), 2))
    return pts


class TestLayeredReconstruction:
    def test_finds_box_and_cylinder(self):
        cloud = PointCloud.from_numpy(_scene())
        solids = layered_reconstruction(
            cloud, jax.random.PRNGKey(0),
            LayeredConfig(layer_height=0.1, min_inliers=40),
        )
        kinds = {s.kind for s in solids}
        assert "cylinder" in kinds and "box" in kinds
        cyl = next(s for s in solids if s.kind == "cylinder")
        np.testing.assert_allclose(cyl.params["center"], [2.0, 1.5], atol=0.02)
        assert abs(cyl.params["radius"] - 0.1) < 0.01
        assert cyl.z_hi - cyl.z_lo >= 0.3  # stacked across layers
        box = next(s for s in solids if s.kind == "box")
        e0, e1 = np.asarray(box.params["endpoints"])
        assert np.linalg.norm(e1 - e0) > 0.8  # wall length recovered

    def test_empty(self):
        cloud = PointCloud.from_numpy(np.zeros((0, 3), np.float32))
        assert layered_reconstruction(cloud, jax.random.PRNGKey(1)) == []

import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.fit.ransac import (
    fit_plane_ransac,
    fit_line2d_ransac,
    fit_circle2d_ransac,
    sample_live_indices,
)


def test_sample_live_indices_only_live():
    mask = np.zeros(100, bool)
    mask[[3, 50, 99]] = True
    idx = sample_live_indices(jax.random.PRNGKey(0), jnp.asarray(mask), (500,))
    assert set(np.unique(np.asarray(idx))) <= {3, 50, 99}


def test_plane_ransac_recovers_plane():
    rng = np.random.default_rng(0)
    n_in, n_out = 600, 200
    xy = rng.uniform(-1, 1, (n_in, 2))
    z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1] + 0.7 + rng.normal(0, 0.003, n_in)
    plane_pts = np.column_stack([xy, z])
    outliers = rng.uniform(-1, 1, (n_out, 3))
    xyz = np.vstack([plane_pts, outliers]).astype(np.float32)
    cloud = PointCloud.from_numpy(xyz)
    plane, inl = fit_plane_ransac(
        cloud.padded_xyz(), cloud.mask, jax.random.PRNGKey(1),
        num_hypotheses=512, threshold=0.01,
    )
    plane = np.asarray(plane)
    # true plane: 0.3x - 0.2y - z + 0.7 = 0 → normalize
    tn = np.array([0.3, -0.2, -1.0, 0.7]) / np.linalg.norm([0.3, -0.2, -1.0])
    got = plane * np.sign(plane[2] * tn[2])
    np.testing.assert_allclose(got, tn, atol=0.02)
    inl = np.asarray(inl)
    assert inl[:n_in].mean() > 0.95
    assert inl[n_in : n_in + n_out].mean() < 0.1


def test_plane_axis_constraint():
    rng = np.random.default_rng(1)
    # vertical plane (normal in xy) should be rejected when axis=z required
    y = rng.uniform(-1, 1, 300)
    z = rng.uniform(0, 1, 300)
    wall = np.column_stack([np.zeros(300), y, z])
    xy = rng.uniform(-1, 1, (200, 2))
    table = np.column_stack([xy, np.full(200, 0.5)])
    xyz = np.vstack([wall, table]).astype(np.float32)
    cloud = PointCloud.from_numpy(xyz)
    plane, inl = fit_plane_ransac(
        cloud.padded_xyz(), cloud.mask, jax.random.PRNGKey(2),
        num_hypotheses=512, threshold=0.01,
        axis=jnp.array([0.0, 0.0, 1.0]), eps_angle=0.26,
    )
    plane = np.asarray(plane)
    assert abs(plane[2]) > 0.95  # picked the horizontal table, not the wall


def test_line2d():
    rng = np.random.default_rng(2)
    t = rng.uniform(-1, 1, 300)
    line_pts = np.column_stack([t, 2 * t + 0.5]) + rng.normal(0, 0.002, (300, 2))
    noise = rng.uniform(-2, 2, (100, 2))
    xy = np.vstack([line_pts, noise]).astype(np.float32)
    cloud_mask = np.ones(len(xy), bool)
    line, inl = fit_line2d_ransac(
        jnp.asarray(xy), jnp.asarray(cloud_mask), jax.random.PRNGKey(3),
        num_hypotheses=256, threshold=0.01,
    )
    line = np.asarray(line)
    # 2x - y + 0.5 = 0 normalized
    tn = np.array([2.0, -1.0, 0.5]) / np.sqrt(5)
    got = line * np.sign(line[0] * tn[0])
    np.testing.assert_allclose(got, tn, atol=0.02)
    assert np.asarray(inl)[:300].mean() > 0.9


def test_circle2d():
    rng = np.random.default_rng(3)
    th = rng.uniform(0, 2 * np.pi, 300)
    circ = np.column_stack([0.4 + 0.25 * np.cos(th), -0.1 + 0.25 * np.sin(th)])
    circ += rng.normal(0, 0.002, circ.shape)
    noise = rng.uniform(-1, 1, (100, 2))
    xy = np.vstack([circ, noise]).astype(np.float32)
    circle, inl = fit_circle2d_ransac(
        jnp.asarray(xy), jnp.asarray(np.ones(len(xy), bool)), jax.random.PRNGKey(4),
        num_hypotheses=512, threshold=0.01, min_radius=0.05, max_radius=1.0,
    )
    circle = np.asarray(circle)
    np.testing.assert_allclose(circle, [0.4, -0.1, 0.25], atol=0.02)
    assert np.asarray(inl)[:300].mean() > 0.9

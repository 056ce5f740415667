"""Tests for cylinder / box / rotational-surface / orientation fitting."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.fit import (
    fit_cylinder_ransac,
    fit_box_zup,
    fit_box_pca,
    fit_rotational_ransac,
    fit_orientation_ransac,
    rotational_distance,
    cylinder_mesh,
    box_mesh,
)


def _cylinder_cloud(n=768, radius=0.05, height=0.3, noise=0.001, seed=0,
                    axis=(0.0, 0.0, 1.0), center=(0.3, -0.2, 0.5)):
    rng = np.random.default_rng(seed)
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    seed_v = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(axis, seed_v); u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    ang = rng.uniform(0, 2 * np.pi, n)
    h = rng.uniform(-height / 2, height / 2, n)
    radial = np.outer(np.cos(ang), u) + np.outer(np.sin(ang), v)
    pts = np.asarray(center) + radius * radial + np.outer(h, axis)
    pts += rng.normal(0, noise, pts.shape)
    normals = radial  # outward normals
    return pts.astype(np.float32), normals.astype(np.float32)


class TestCylinder:
    def test_recovers_cylinder(self):
        pts, nrm = _cylinder_cloud()
        cloud = PointCloud.from_numpy(pts, {"normal": nrm})
        cyl, inl = fit_cylinder_ransac(
            cloud.padded_xyz(), cloud.channel("normal"), cloud.mask,
            jax.random.PRNGKey(0), threshold=0.01,
        )
        assert abs(float(cyl.radius) - 0.05) < 0.005
        ax = np.abs(np.asarray(cyl.axis))
        assert ax[2] > 0.99  # axis ≈ ±z
        assert int(jnp.sum(inl)) > 0.9 * 768

    def test_with_outliers(self):
        pts, nrm = _cylinder_cloud(n=600)
        rng = np.random.default_rng(1)
        out = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        out_n = rng.normal(size=(100, 3)); out_n /= np.linalg.norm(out_n, axis=1, keepdims=True)
        all_pts = np.vstack([pts, out])
        all_n = np.vstack([nrm, out_n.astype(np.float32)])
        cloud = PointCloud.from_numpy(all_pts, {"normal": all_n})
        cyl, inl = fit_cylinder_ransac(
            cloud.padded_xyz(), cloud.channel("normal"), cloud.mask,
            jax.random.PRNGKey(2), threshold=0.01,
        )
        assert abs(float(cyl.radius) - 0.05) < 0.01

    def test_mesh(self):
        verts, tris = cylinder_mesh(
            np.zeros(3), np.array([0, 0, 1.0]), 0.05, -0.1, 0.1, segments=12
        )
        assert verts.shape == (24, 3) and tris.shape == (24, 3)
        r = np.linalg.norm(verts[:, :2], axis=1)
        np.testing.assert_allclose(r, 0.05, atol=1e-6)


class TestBox:
    def test_zup_box(self):
        rng = np.random.default_rng(3)
        # box 0.2 x 0.1 x 0.3 rotated 30° about z
        local = rng.uniform(-0.5, 0.5, (2048, 3)) * [0.2, 0.1, 0.3]
        th = np.deg2rad(30)
        R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        pts = (local @ R.T + [1.0, 2.0, 0.5]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        box = fit_box_zup(cloud.padded_xyz(), cloud.mask)
        e = np.sort(np.asarray(box.extents))
        assert abs(e[2] - 0.3) < 0.02 and abs(e[1] - 0.2) < 0.02 and abs(e[0] - 0.1) < 0.02
        np.testing.assert_allclose(np.asarray(box.center), [1.0, 2.0, 0.5], atol=0.02)
        # recovered yaw axis should match ±30°
        major = np.asarray(box.axes)[np.argmax(np.asarray(box.extents)[:2])]
        ang = np.arctan2(abs(major[1]), abs(major[0]))
        assert abs(ang - th) < 0.05

    def test_pca_box_orthonormal(self):
        rng = np.random.default_rng(4)
        pts = (rng.uniform(-1, 1, (512, 3)) * [0.3, 0.2, 0.05]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        box = fit_box_pca(cloud.padded_xyz(), cloud.mask)
        A = np.asarray(box.axes)
        np.testing.assert_allclose(A @ A.T, np.eye(3), atol=1e-4)
        e = np.sort(np.asarray(box.extents))
        assert e[0] < 0.15 and e[2] > 0.5

    def test_box_mesh(self):
        v, t = box_mesh([0, 0, 0], np.eye(3), [2, 2, 2])
        assert v.shape == (8, 3) and t.shape == (12, 3)
        np.testing.assert_allclose(np.abs(v), 1.0)


class TestRotational:
    def test_recovers_vase_profile(self):
        # surface of revolution: r(z) = 0.08 + 0.03 sin(6z), axis = z @ origin
        rng = np.random.default_rng(5)
        n = 1024
        z = rng.uniform(-0.2, 0.2, n)
        r = 0.08 + 0.03 * np.sin(6 * z)
        ang = rng.uniform(0, 2 * np.pi, n)
        pts = np.column_stack([r * np.cos(ang), r * np.sin(ang), z]).astype(np.float32)
        # exact normals: gradient of (sqrt(x²+y²) − r(z))
        drdz = 0.03 * 6 * np.cos(6 * z)
        nr = np.column_stack([np.cos(ang), np.sin(ang), -drdz])
        nr /= np.linalg.norm(nr, axis=1, keepdims=True)
        cloud = PointCloud.from_numpy(pts, {"normal": nr.astype(np.float32)})
        surf, inl = fit_rotational_ransac(
            cloud.padded_xyz(), cloud.channel("normal"), cloud.mask,
            jax.random.PRNGKey(1), threshold=0.01,
        )
        frac = int(jnp.sum(inl)) / n
        assert frac > 0.7
        ax = np.abs(np.asarray(surf.axis))
        assert ax[2] > 0.95
        d = np.asarray(rotational_distance(surf, cloud.padded_xyz()))
        live = np.asarray(cloud.mask)
        assert np.median(d[live]) < 0.01


class TestOrientation:
    def test_manhattan_normals(self):
        rng = np.random.default_rng(6)
        th = np.deg2rad(25)
        d = np.array([np.cos(th), np.sin(th), 0.0])
        left = np.cross([0, 0, 1.0], d)
        dirs = np.stack([d, -d, left, -left])
        n = 400
        pick = rng.integers(0, 4, n)
        normals = dirs[pick] + rng.normal(0, 0.02, (n, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        # add noise normals pointing up (should be ignored via the ⊥ gate)
        up = np.tile([0, 0, 1.0], (100, 1)) + rng.normal(0, 0.02, (100, 3))
        up /= np.linalg.norm(up, axis=1, keepdims=True)
        all_n = np.vstack([normals, up]).astype(np.float32)
        mask = np.ones(len(all_n), bool)
        direction, inl = fit_orientation_ransac(
            jnp.asarray(all_n), jnp.asarray(mask), jax.random.PRNGKey(3),
            eps_angle=0.15,
        )
        dv = np.asarray(direction)
        # recovered direction matches one of the 4 cardinal dirs
        best = max(abs(dv @ d), abs(dv @ left))
        assert best > 0.99
        inl_np = np.asarray(inl)
        assert inl_np[:n].mean() > 0.9  # manhattan normals are inliers
        assert inl_np[n:n+100].mean() < 0.1  # up-normals are not

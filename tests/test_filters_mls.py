"""Tests for statistical noise removal, box/normal filters, region growing, MLS."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.ops.filters import (
    remove_statistical_outliers,
    box_filter,
    axis_parallel_normal_mask,
    axis_perpendicular_normal_mask,
    z_band_mask,
)
from mapping_private_tpu.ops.region_growing import region_grow
from mapping_private_tpu.ops.mls import mls_smooth


def _plane_with_outliers(n=512, n_out=8, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1, 1, (n, 2))
    pts = np.column_stack([xy, np.zeros(n)]).astype(np.float32)
    out_idx = rng.choice(n, n_out, replace=False)
    pts[out_idx, 2] = rng.uniform(0.5, 1.0, n_out)  # far off-plane
    return pts, out_idx


class TestStatisticalOutlierRemoval:
    def test_removes_planted_outliers(self):
        pts, out_idx = _plane_with_outliers()
        cloud = PointCloud.from_numpy(pts)
        filtered, valid = remove_statistical_outliers(cloud, k=16, alpha=1.0)
        kept = np.asarray(filtered.mask)
        assert bool(valid)
        # all planted outliers removed
        assert not kept[out_idx].any()
        # vast majority of inliers kept
        inlier_rows = np.setdiff1d(np.arange(len(pts)), out_idx)
        assert kept[inlier_rows].mean() > 0.8

    def test_min_nr_pts_gate(self):
        pts, _ = _plane_with_outliers()
        cloud = PointCloud.from_numpy(pts)
        _, valid = remove_statistical_outliers(cloud, k=16, alpha=1.0, min_nr_pts=10**6)
        assert not bool(valid)

    def test_jit_compatible(self):
        pts, _ = _plane_with_outliers()
        cloud = PointCloud.from_numpy(pts)
        f = jax.jit(lambda c: remove_statistical_outliers(c, k=16, alpha=1.0))
        filtered, _ = f(cloud)
        assert filtered.mask.shape == cloud.mask.shape


class TestBoxAndAxisFilters:
    def test_box_filter(self):
        pts = np.array([[0, 0, 0], [2, 0, 0], [0.5, 0.5, 0.5]], np.float32)
        cloud = PointCloud.from_numpy(pts)
        out = box_filter(cloud, [-1, -1, -1], [1, 1, 1])
        kept = np.asarray(out.mask)[:3]
        assert kept.tolist() == [True, False, True]

    def test_z_band(self):
        pts = np.array([[0, 0, 0.1], [0, 0, 0.9], [0, 0, 2.0]], np.float32)
        cloud = PointCloud.from_numpy(pts)
        m = z_band_mask(cloud.xyz, cloud.mask, 0.05, 1.0)
        assert np.asarray(m)[:3].tolist() == [True, True, False]

    def test_axis_gates(self):
        normals = jnp.array(
            [[0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0], [0.7071, 0, 0.7071]]
        )
        mask = jnp.ones(4, bool)
        z = jnp.array([0.0, 0.0, 1.0])
        par = np.asarray(axis_parallel_normal_mask(normals, mask, z, 0.3))
        perp = np.asarray(axis_perpendicular_normal_mask(normals, mask, z, 0.3))
        assert par.tolist() == [True, True, False, False]
        assert perp.tolist() == [False, False, True, False]


class TestRegionGrowing:
    def test_two_blobs_with_gate(self):
        rng = np.random.default_rng(1)
        a = rng.normal([0, 0, 0], 0.02, (64, 3))
        b = rng.normal([5, 0, 0], 0.02, (64, 3))
        pts = np.vstack([a, b]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        n = cloud.capacity
        labels = np.asarray(
            region_grow(cloud.padded_xyz(), cloud.mask, radius=0.5)
        )
        la, lb = set(labels[:64].tolist()), set(labels[64:128].tolist())
        assert len(la) == 1 and len(lb) == 1 and la != lb

        # seed gate: only blob A contains a seed → blob B unclustered
        seed = np.zeros(n, bool)
        seed[0] = True
        labels2 = np.asarray(
            region_grow(
                cloud.padded_xyz(), cloud.mask, radius=0.5,
                seed_mask=jnp.asarray(seed),
            )
        )
        assert (labels2[:64] == labels2[0]).all()
        assert (labels2[64:128] == n).all()

    def test_grow_mask_blocks_points(self):
        pts = np.array(
            [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0]], np.float32
        )
        cloud = PointCloud.from_numpy(pts)
        n = cloud.capacity
        grow = np.zeros(n, bool)
        grow[:2] = True  # only first two may join
        labels = np.asarray(
            region_grow(
                cloud.padded_xyz(), cloud.mask, radius=0.15,
                grow_mask=jnp.asarray(grow),
            )
        )
        assert labels[0] == labels[1]
        assert labels[2] == n and labels[3] == n


class TestMLS:
    def test_denoises_plane(self):
        rng = np.random.default_rng(2)
        xy = rng.uniform(-0.5, 0.5, (512, 2))
        z = rng.normal(0, 0.004, 512)
        pts = np.column_stack([xy, z]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        new_xyz, nrm, _ = mls_smooth(
            cloud.padded_xyz(), cloud.mask, search_radius=0.15, k=32
        )
        live = np.asarray(cloud.mask)
        z_in = np.abs(pts[:, 2]).mean()
        z_out = np.abs(np.asarray(new_xyz)[live, 2]).mean()
        assert z_out < 0.5 * z_in  # smoothing pulls points to the plane
        nz = np.abs(np.asarray(nrm)[live, 2])
        assert nz.mean() > 0.99  # normals ≈ ±z

    def test_preserves_curved_surface(self):
        # points on a paraboloid z = x² + y² should stay near it (order-2
        # polynomial reproduces quadratics exactly up to weighting)
        rng = np.random.default_rng(3)
        xy = rng.uniform(-0.4, 0.4, (512, 2))
        z = (xy**2).sum(axis=1)
        pts = np.column_stack([xy, z]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        new_xyz, _, _ = mls_smooth(
            cloud.padded_xyz(), cloud.mask, search_radius=0.12, k=24
        )
        live = np.asarray(cloud.mask)
        p = np.asarray(new_xyz)[live]
        resid = np.abs(p[:, 2] - (p[:, 0] ** 2 + p[:, 1] ** 2))
        assert resid.mean() < 0.01

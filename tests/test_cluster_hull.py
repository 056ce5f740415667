import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.ops.cluster import euclidean_cluster, top_clusters, cluster_sizes
from mapping_private_tpu.ops.hull import (
    radial_hull,
    in_radial_hull,
    convex_hull_2d,
    point_in_polygon,
    polygon_area,
)


def _three_blobs(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal([0, 0, 0], 0.05, (100, 3))
    b = rng.normal([1, 0, 0], 0.05, (60, 3))
    c = rng.normal([0, 2, 0], 0.05, (30, 3))
    return np.vstack([a, b, c]).astype(np.float32)


def test_euclidean_cluster_three_blobs():
    xyz = _three_blobs()
    cloud = PointCloud.from_numpy(xyz)
    labels = euclidean_cluster(cloud.padded_xyz(), cloud.mask, tolerance=0.3, k=8)
    labels = np.asarray(labels)[:190]
    # exactly 3 distinct labels, grouped correctly
    assert len(np.unique(labels)) == 3
    assert len(np.unique(labels[:100])) == 1
    assert len(np.unique(labels[100:160])) == 1
    assert len(np.unique(labels[160:])) == 1


def test_top_clusters_ordering():
    xyz = _three_blobs()
    cloud = PointCloud.from_numpy(xyz)
    labels = euclidean_cluster(cloud.padded_xyz(), cloud.mask, tolerance=0.3, k=8)
    members, sizes = top_clusters(labels, cloud.mask, 5, min_size=5)
    sizes = np.asarray(sizes)
    assert list(sizes[:3]) == [100, 60, 30]
    assert (sizes[3:] == 0).all()
    members = np.asarray(members)
    assert members[0][:100].all() and not members[0][100:].any()


def test_cluster_sizes():
    xyz = _three_blobs()
    cloud = PointCloud.from_numpy(xyz)
    labels = euclidean_cluster(cloud.padded_xyz(), cloud.mask, tolerance=0.3, k=8)
    sz = np.asarray(cluster_sizes(labels, cloud.mask))
    assert (sz[:100] == 100).all() and (sz[100:160] == 60).all()


def test_normal_gate_splits_touching_planes():
    # horizontal plane and vertical wall meeting at an edge: without the
    # normal gate they'd be one cluster, with it they split
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 1, (200, 2))
    floor = np.column_stack([xy[:, 0], xy[:, 1], np.zeros(200)])
    yz = rng.uniform(0, 1, (200, 2))
    wall = np.column_stack([np.zeros(200), yz[:, 0], yz[:, 1]])
    xyz = np.vstack([floor, wall]).astype(np.float32)
    normals = np.vstack(
        [np.tile([0, 0, 1.0], (200, 1)), np.tile([1.0, 0, 0], (200, 1))]
    ).astype(np.float32)
    cloud = PointCloud.from_numpy(xyz)
    nrm = jnp.asarray(np.vstack([normals, np.zeros((cloud.capacity - 400, 3), np.float32)]))
    lab_free = euclidean_cluster(cloud.padded_xyz(), cloud.mask, 0.3, k=12)
    lab_gated = euclidean_cluster(
        cloud.padded_xyz(), cloud.mask, 0.3, k=12,
        normals=nrm, angle_threshold=0.4,
    )
    assert len(np.unique(np.asarray(lab_free)[:400])) == 1
    assert len(np.unique(np.asarray(lab_gated)[:400])) == 2


def test_radial_hull_membership():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (2000, 2)).astype(np.float32)  # filled square
    mask = jnp.ones(2000, bool)
    hull = radial_hull(jnp.asarray(pts), mask, num_bins=72)
    inside = np.array([[0, 0], [0.8, 0.8], [-0.9, 0.2]], np.float32)
    outside = np.array([[2, 0], [0, -1.8], [1.6, 1.6]], np.float32)
    assert np.asarray(in_radial_hull(hull, jnp.asarray(inside))).all()
    assert not np.asarray(in_radial_hull(hull, jnp.asarray(outside))).any()


def test_convex_hull_exact():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (500, 2))
    pts = np.vstack([pts, [[0, 0], [1, 0], [1, 1], [0, 1]]])
    hull = convex_hull_2d(pts)
    np.testing.assert_allclose(polygon_area(hull), 1.0, atol=1e-9)
    assert point_in_polygon(hull, np.array([[0.5, 0.5]]))[0]
    assert not point_in_polygon(hull, np.array([[1.5, 0.5]]))[0]

import dataclasses

import jax
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.models.table_detector import (
    TableDetectorConfig,
    detect_table,
)


def synthetic_table_scene(seed=0):
    """Table at z=0.75 with two objects, plus floor and a wall."""
    rng = np.random.default_rng(seed)
    # tabletop 1.0 x 0.8 m
    t = rng.uniform([-0.5, -0.4], [0.5, 0.4], (4000, 2))
    table = np.column_stack([t, np.full(len(t), 0.75) + rng.normal(0, 0.002, len(t))])
    # object A: box 10cm at (0.2, 0.1)
    a = rng.uniform([0.15, 0.05, 0.75], [0.25, 0.15, 0.87], (800, 3))
    # object B: cylinder-ish at (-0.25, -0.2)
    th = rng.uniform(0, 2 * np.pi, 600)
    h = rng.uniform(0.75, 0.95, 600)
    b = np.column_stack([-0.25 + 0.04 * np.cos(th), -0.2 + 0.04 * np.sin(th), h])
    # floor (below z band) and wall (vertical, inside band)
    f = rng.uniform([-2, -2, 0], [2, 2, 0.02], (1500, 3))
    w = np.column_stack(
        [np.full(1200, 1.8), rng.uniform(-2, 2, 1200), rng.uniform(0.0, 2.0, 1200)]
    )
    xyz = np.vstack([table, a, b, f, w]).astype(np.float32)
    rng.shuffle(xyz)
    return xyz


def test_detect_table_synthetic():
    xyz = synthetic_table_scene()
    cloud = PointCloud.from_numpy(xyz)
    cfg = TableDetectorConfig(down_capacity=4096, sac_hypotheses=256)
    det, down = detect_table(cloud, jax.random.PRNGKey(0), cfg)
    assert bool(det.found)
    plane = np.asarray(det.plane)
    assert abs(plane[2]) > 0.99
    # plane height ~0.75: n·p + d = 0 → z = -d/nz
    z0 = -plane[3] / plane[2]
    np.testing.assert_allclose(z0, 0.75, atol=0.02)
    # table bounds
    np.testing.assert_allclose(np.asarray(det.table_min)[:2], [-0.5, -0.4], atol=0.05)
    np.testing.assert_allclose(np.asarray(det.table_max)[:2], [0.5, 0.4], atol=0.05)
    # two objects found
    n_obj = int(det.num_objects())
    assert n_obj == 2
    centers = np.asarray(det.object_centers)[np.asarray(det.object_sizes) > 0]
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0][:2], [-0.25, -0.2], atol=0.05)
    np.testing.assert_allclose(centers[1][:2], [0.2, 0.1], atol=0.05)


def test_no_table_scene():
    rng = np.random.default_rng(5)
    xyz = rng.uniform([-2, -2, 0], [2, 2, 3], (3000, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(xyz)
    cfg = TableDetectorConfig(down_capacity=4096, sac_hypotheses=128)
    det, _ = detect_table(cloud, jax.random.PRNGKey(1), cfg)
    assert not bool(det.found)
    assert int(det.num_objects()) == 0


def test_jit_cache_reuse():
    # same config → no retrace (static capacities)
    xyz = synthetic_table_scene(1)
    cloud = PointCloud.from_numpy(xyz, capacity=8192)
    cfg = TableDetectorConfig(down_capacity=4096)
    det1, _ = detect_table(cloud, jax.random.PRNGKey(0), cfg)
    xyz2 = synthetic_table_scene(2)
    cloud2 = PointCloud.from_numpy(xyz2, capacity=8192)
    det2, _ = detect_table(cloud2, jax.random.PRNGKey(1), cfg)
    assert bool(det1.found) and bool(det2.found)


def test_wanted_table_gate():
    """one_table variant: with two tables in the scene, the wanted-table
    gate (table_object_detector_passive_one_table.cpp:434-445) must select
    the table near the configured center even though the other is bigger."""
    rng = np.random.default_rng(3)
    # big table A at origin, z=0.75
    ta = rng.uniform([-0.6, -0.5], [0.6, 0.5], (5000, 2))
    A = np.column_stack([ta, np.full(len(ta), 0.75) + rng.normal(0, 0.002, len(ta))])
    # small table B at (2.5, 0), z=0.90
    tb = rng.uniform([2.2, -0.3], [2.8, 0.3], (2500, 2))
    B = np.column_stack([tb, np.full(len(tb), 0.90) + rng.normal(0, 0.002, len(tb))])
    xyz = np.vstack([A, B]).astype(np.float32)
    cloud = PointCloud.from_numpy(xyz)

    base = TableDetectorConfig(down_capacity=4096, sac_hypotheses=256)
    det, _ = detect_table(cloud, jax.random.PRNGKey(0), base)
    assert bool(det.found)
    z0 = -float(np.asarray(det.plane)[3]) / float(np.asarray(det.plane)[2])
    np.testing.assert_allclose(z0, 0.75, atol=0.03)  # bigger table wins

    gated = dataclasses.replace(
        base, wanted_table_center=(2.5, 0.0), max_sqr_dist_to_wanted_table=0.5
    )
    det2, _ = detect_table(cloud, jax.random.PRNGKey(0), gated)
    assert bool(det2.found)
    z1 = -float(np.asarray(det2.plane)[3]) / float(np.asarray(det2.plane)[2])
    np.testing.assert_allclose(z1, 0.90, atol=0.03)  # wanted table wins

    # gate pointing nowhere → no table accepted
    nowhere = dataclasses.replace(
        base, wanted_table_center=(9.0, 9.0), max_sqr_dist_to_wanted_table=0.25
    )
    det3, _ = detect_table(cloud, jax.random.PRNGKey(0), nowhere)
    assert not bool(det3.found)

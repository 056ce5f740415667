"""Tests for PCA subspace learning + sliding-box subspace detection."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.voxelgrid import VoxelGrid
from mapping_private_tpu.features.colorchlac import (
    colorchlac117,
    colorchlac117_subdiv,
    occupied_count_subdiv,
)
from mapping_private_tpu.recognition import (
    build_scene_data,
    pca_fit,
    read_pca,
    search_object,
    subspace_axis,
    write_pca,
)
from mapping_private_tpu.recognition.search import _box_sums, active_modes


def _grid_from_arrays(count, r, g, b):
    return VoxelGrid(
        origin=jnp.zeros(3), voxel_size=jnp.float32(0.01),
        count=jnp.asarray(count, jnp.int32),
        sums={"r": jnp.asarray(r, jnp.float32),
              "g": jnp.asarray(g, jnp.float32),
              "b": jnp.asarray(b, jnp.float32)},
    )


def _random_object_grid(rng, shape, color_bias):
    """Dense colored blob with a distinctive color distribution."""
    count = np.ones(shape, np.int64)
    r = np.clip(rng.normal(color_bias[0], 20, shape), 0, 255) * count
    g = np.clip(rng.normal(color_bias[1], 20, shape), 0, 255) * count
    b = np.clip(rng.normal(color_bias[2], 20, shape), 0, 255) * count
    return count, r, g, b


class TestPCA:
    def test_eigh_descending_and_reconstruction(self):
        rng = np.random.default_rng(0)
        # anisotropic gaussian: leading axis must capture max variance
        A = rng.normal(size=(5, 5))
        f = rng.normal(size=(2000, 5)) @ np.diag([5, 3, 1, 0.5, 0.1]) @ A
        p = pca_fit(jnp.asarray(f, jnp.float32), mean_flg=True)
        assert (np.diff(p.variance) <= 1e-4).all()  # descending
        # axis orthonormal
        np.testing.assert_allclose(p.axis.T @ p.axis, np.eye(5), atol=1e-4)
        # covariance reconstruction
        cov = (f - f.mean(0)).T @ (f - f.mean(0)) / len(f)
        rec = p.axis @ np.diag(p.variance) @ p.axis.T
        np.testing.assert_allclose(rec, cov, atol=1e-2)

    def test_file_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        f = rng.normal(size=(256, 8)).astype(np.float32)
        p = pca_fit(jnp.asarray(f), mean_flg=True)
        for ascii_fmt in (False, True):
            path = str(tmp_path / f"pca_{ascii_fmt}.dat")
            write_pca(path, p, ascii_fmt=ascii_fmt)
            q = read_pca(path, ascii_fmt=ascii_fmt)
            np.testing.assert_allclose(q.axis, p.axis, atol=1e-5)
            np.testing.assert_allclose(q.variance, p.variance, atol=1e-5)
            np.testing.assert_allclose(q.mean, p.mean, atol=1e-5)

    def test_subspace_axis_scaling(self):
        rng = np.random.default_rng(2)
        f = rng.normal(size=(128, 6)).astype(np.float32)
        p = pca_fit(jnp.asarray(f))
        aq = subspace_axis(p, 3)
        assert aq.shape == (3, 6)
        np.testing.assert_allclose(aq, p.axis[:, :3].T, atol=1e-6)
        aqm = subspace_axis(p, 3, multiple_similarity=True)
        np.testing.assert_allclose(aqm[0], aq[0], atol=1e-6)
        scale1 = np.sqrt(p.variance[1] / p.variance[0])
        np.testing.assert_allclose(aqm[1], aq[1] * scale1, atol=1e-5)


class TestIntegralTable:
    def test_box_sums_match_bruteforce(self):
        rng = np.random.default_rng(3)
        g = rng.normal(size=(7, 6, 5, 2)).astype(np.float32)
        sat = jnp.pad(
            jnp.cumsum(jnp.cumsum(jnp.cumsum(jnp.asarray(g), 0), 1), 2),
            ((1, 0), (1, 0), (1, 0), (0, 0)),
        )
        for (rx, ry, rz) in [(1, 1, 1), (2, 3, 1), (3, 2, 4), (7, 6, 5)]:
            out = np.asarray(_box_sums(sat, rx, ry, rz))
            for x in range(7 - rx + 1):
                for y in range(6 - ry + 1):
                    for z in range(5 - rz + 1):
                        expect = g[x:x+rx, y:y+ry, z:z+rz].sum((0, 1, 2))
                        np.testing.assert_allclose(out[x, y, z], expect, atol=1e-3)

    def test_active_modes(self):
        assert active_modes(2, 2, 2) == [0]
        assert len(active_modes(2, 2, 3)) == 3
        assert len(active_modes(1, 2, 3)) == 6


class TestSubdivFeatures:
    def test_blocks_sum_to_global(self):
        rng = np.random.default_rng(4)
        shape = (8, 8, 8)
        count = (rng.random(shape) > 0.5).astype(np.int64)
        r = rng.uniform(0, 255, shape) * count
        g = rng.uniform(0, 255, shape) * count
        b = rng.uniform(0, 255, shape) * count
        grid = _grid_from_arrays(count, r, g, b)
        full = np.asarray(colorchlac117(grid))
        sub = np.asarray(colorchlac117_subdiv(grid, 4))
        assert sub.shape == (2, 2, 2, 117)
        np.testing.assert_allclose(sub.sum((0, 1, 2)), full, rtol=1e-4, atol=1e-4)

    def test_occupied_count(self):
        count = np.zeros((4, 4, 4), np.int64)
        count[:2, :2, :2] = 1
        grid = _grid_from_arrays(count, count * 0, count * 0, count * 0)
        occ = np.asarray(occupied_count_subdiv(grid, 2))
        assert occ[0, 0, 0] == 8 and occ.sum() == 8


class TestSlidingBoxDetection:
    def test_finds_planted_object(self):
        rng = np.random.default_rng(5)
        scene_shape = (24, 20, 16)  # voxels
        bs = 2  # subdivision = 2³ voxels
        # empty scene with sparse gray clutter
        count = (rng.random(scene_shape) > 0.97).astype(np.int64)
        r = 128.0 * count; g = 128.0 * count; b = 128.0 * count
        # plant a dense red 6x4x4-voxel object at voxel (12, 8, 4)
        ox, oy, oz, sx, sy, sz = 12, 8, 4, 6, 4, 4
        obj_c, obj_r, obj_g, obj_b = _random_object_grid(rng, (sx, sy, sz), (220, 30, 30))
        count[ox:ox+sx, oy:oy+sy, oz:oz+sz] = obj_c
        r[ox:ox+sx, oy:oy+sy, oz:oz+sz] = obj_r
        g[ox:ox+sx, oy:oy+sy, oz:oz+sz] = obj_g
        b[ox:ox+sx, oy:oy+sy, oz:oz+sz] = obj_b
        scene_grid = _grid_from_arrays(count, r, g, b)

        # learn the object's subspace from 20 jittered renderings of itself
        feats = []
        for i in range(20):
            c2, r2, g2, b2 = _random_object_grid(
                np.random.default_rng(100 + i), (sx, sy, sz), (220, 30, 30)
            )
            og = _grid_from_arrays(c2, r2, g2, b2)
            feats.append(np.asarray(colorchlac117(og)))
        pca = pca_fit(jnp.asarray(np.stack(feats)))
        axis_q = subspace_axis(pca, 5)

        sub_feats = colorchlac117_subdiv(scene_grid, bs)
        exist = occupied_count_subdiv(scene_grid, bs)
        scene = build_scene_data(sub_feats, exist)
        ranges = (sx // bs, sy // bs, sz // bs)  # (3, 2, 2) subdivisions
        dets = search_object(scene, axis_q, ranges, rank_num=3, exist_threshold=8.0)
        assert dets, "no detections"
        best = dets[0]
        # best box origin should be the planted location (subdiv coords)
        assert (best.x, best.y, best.z) == (ox // bs, oy // bs, oz // bs)
        assert best.score > 0.9

    def test_rotated_object_uses_other_mode(self):
        rng = np.random.default_rng(6)
        scene_shape = (20, 20, 12)
        bs = 2
        count = np.zeros(scene_shape, np.int64)
        r = np.zeros(scene_shape); g = np.zeros(scene_shape); b = np.zeros(scene_shape)
        # object is 6x2x4 voxels but planted ROTATED: occupies 2x6x4
        ox, oy, oz = 4, 6, 2
        obj_c, obj_r, obj_g, obj_b = _random_object_grid(rng, (2, 6, 4), (30, 200, 60))
        count[ox:ox+2, oy:oy+6, oz:oz+4] = obj_c
        r[ox:ox+2, oy:oy+6, oz:oz+4] = obj_r
        g[ox:ox+2, oy:oy+6, oz:oz+4] = obj_g
        b[ox:ox+2, oy:oy+6, oz:oz+4] = obj_b
        scene_grid = _grid_from_arrays(count, r, g, b)

        feats = []
        for i in range(16):
            c2, r2, g2, b2 = _random_object_grid(
                np.random.default_rng(200 + i), (6, 2, 4), (30, 200, 60)
            )
            feats.append(np.asarray(colorchlac117(_grid_from_arrays(c2, r2, g2, b2))))
        pca = pca_fit(jnp.asarray(np.stack(feats)))
        axis_q = subspace_axis(pca, 4)

        scene = build_scene_data(
            colorchlac117_subdiv(scene_grid, bs), occupied_count_subdiv(scene_grid, bs)
        )
        # ranges in the OBJECT frame: (3, 1, 2) subdivisions — rotation modes
        # must find the (1, 3, 2) placement
        dets = search_object(scene, axis_q, (3, 1, 2), rank_num=2, exist_threshold=4.0)
        assert dets
        best = dets[0]
        assert (best.xrange, best.yrange, best.zrange) == (1, 3, 2)
        assert (best.x, best.y, best.z) == (ox // bs, oy // bs, oz // bs)

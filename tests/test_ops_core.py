import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud, se3_exp, se3_log, se3_apply, se3_inverse
from mapping_private_tpu.core.voxelgrid import voxelize
from mapping_private_tpu.ops import (
    knn_bruteforce,
    build_grid_hash,
    knn_grid,
    radius_count_grid,
    voxel_downsample,
    estimate_normals,
    smallest_eigenvector_3x3,
)


def _rand_cloud(n=500, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    return xyz


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            xi = jnp.asarray(rng.normal(scale=0.5, size=(6,)).astype(np.float32))
            T = se3_exp(xi)
            xi2 = se3_log(T)
            np.testing.assert_allclose(xi, xi2, atol=1e-3)

    def test_inverse(self):
        xi = jnp.asarray(np.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.1], np.float32))
        T = se3_exp(xi)
        np.testing.assert_allclose(T @ se3_inverse(T), np.eye(4), atol=1e-5)

    def test_apply(self):
        xi = jnp.asarray(np.array([1.0, 2.0, 3.0, 0, 0, 0], np.float32))
        p = jnp.zeros((4, 3))
        out = se3_apply(se3_exp(xi), p)
        np.testing.assert_allclose(out, np.tile([1, 2, 3], (4, 1)), atol=1e-6)


class TestKNN:
    def test_bruteforce_matches_numpy(self):
        xyz = _rand_cloud(300)
        cloud = PointCloud.from_numpy(xyz)
        k = 8
        idx, sq = jax.jit(lambda c: knn_bruteforce(c.padded_xyz(), c.padded_xyz(), c.mask, k, True))(cloud)
        idx, sq = np.asarray(idx), np.asarray(sq)
        d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :k]
        np.testing.assert_allclose(np.sort(sq[:300], 1), ref, rtol=1e-4, atol=1e-6)

    def test_nn_grid_1nn_matches_bruteforce(self):
        """Scalable 1-NN path (nn_grid_1nn): exact agreement with brute
        force on a scan-like surface (the big-cloud ICP correspondence
        backend; disagreements may only be f32 near-ties)."""
        rng = np.random.default_rng(7)
        n = 8000
        xy = rng.uniform(0, 5, (n, 2))
        z = 0.3 * np.sin(xy[:, 0] * 2) + rng.normal(0, 0.005, n)
        tgt = np.column_stack([xy, z]).astype(np.float32)
        src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
        mask = jnp.ones((n,), bool)
        from mapping_private_tpu.ops.neighbors import nn_grid_1nn

        grid = build_grid_hash(jnp.asarray(tgt), mask, 0.1)
        gi, gs = nn_grid_1nn(grid, jnp.asarray(src), cap_per_cell=32)
        bi, bs = knn_bruteforce(jnp.asarray(src), jnp.asarray(tgt), mask, k=1)
        # judge both answers by exact f64 distances: the grid pick must be
        # as close as the brute pick up to f32 representation noise
        t64, s64 = tgt.astype(np.float64), src.astype(np.float64)
        d_grid = np.sum((s64 - t64[np.asarray(gi)]) ** 2, axis=1)
        d_brut = np.sum((s64 - t64[np.asarray(bi[:, 0])]) ** 2, axis=1)
        assert float(np.max(d_grid - d_brut)) < 1e-8

    def test_grid_matches_bruteforce(self):
        xyz = _rand_cloud(400, seed=2)
        cloud = PointCloud.from_numpy(xyz)
        pts = cloud.padded_xyz()
        k = 5
        # cell 0.4 on a [-1,1] cube: stencil holds plenty of points
        grid = build_grid_hash(pts, cloud.mask, 0.4)
        gi, gs = knn_grid(grid, pts, k, cap_per_cell=64,
                          self_idx=jnp.arange(pts.shape[0], dtype=jnp.int32))
        bi, bs = knn_bruteforce(pts, pts, cloud.mask, k, exclude_self=True)
        # distances must match where the true k-th nbr is within one cell
        gs, bs = np.asarray(gs)[:400], np.asarray(bs)[:400]
        within = bs[:, -1] <= 0.4 * 0.4
        np.testing.assert_allclose(gs[within], bs[within], rtol=1e-4, atol=1e-6)

    def test_radius_count(self):
        xyz = _rand_cloud(200, seed=3)
        cloud = PointCloud.from_numpy(xyz)
        pts = cloud.padded_xyz()
        r = 0.3
        grid = build_grid_hash(pts, cloud.mask, r)
        cnt = np.asarray(radius_count_grid(grid, pts, r, cap_per_cell=128))[:200]
        d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
        ref = (d2 <= r * r).sum(1)
        np.testing.assert_array_equal(cnt, ref)


class TestVoxel:
    def test_downsample_centroids(self):
        xyz = _rand_cloud(1000, seed=4)
        cloud = PointCloud.from_numpy(xyz)
        out = jax.jit(lambda c: voxel_downsample(c, 0.25, 1024))(cloud)
        res = out.to_numpy()
        # number of occupied voxels matches numpy unique
        cells = np.floor(xyz / 0.25).astype(np.int64)
        uniq = np.unique(cells, axis=0)
        assert res["xyz"].shape[0] == uniq.shape[0]
        # each centroid is the mean of its voxel's points
        lin = {tuple(c): i for i, c in enumerate(uniq)}
        sums = np.zeros((len(uniq), 3))
        cnts = np.zeros(len(uniq))
        for p, c in zip(xyz, cells):
            i = lin[tuple(c)]
            sums[i] += p
            cnts[i] += 1
        ref = sums / cnts[:, None]
        got = res["xyz"]
        # match rows by cell id of the centroid
        got_cells = np.floor(got / 0.25).astype(np.int64)
        order = np.array([lin[tuple(c)] for c in got_cells])
        np.testing.assert_allclose(got, ref[order], rtol=1e-4, atol=1e-5)

    def test_dense_voxelize(self):
        xyz = np.array([[0.05, 0.05, 0.05], [0.15, 0.05, 0.05], [0.05, 0.05, 0.05]],
                       np.float32)
        cloud = PointCloud.from_numpy(xyz, channels={"r": np.array([10., 20., 30.])})
        vg = voxelize(cloud, 0.1, jnp.zeros(3), (4, 4, 4), channels=("r",))
        cnt = np.asarray(vg.count)
        assert cnt[0, 0, 0] == 2 and cnt[1, 0, 0] == 1
        assert cnt.sum() == 3
        np.testing.assert_allclose(np.asarray(vg.mean("r"))[0, 0, 0], 20.0)


class TestNormals:
    def test_eig3x3_matches_numpy(self):
        rng = np.random.default_rng(5)
        B = rng.normal(size=(50, 3, 3)).astype(np.float32)
        A = B @ B.transpose(0, 2, 1)
        ev, vec = smallest_eigenvector_3x3(jnp.asarray(A))
        ev, vec = np.asarray(ev), np.asarray(vec)
        ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(ev, ref, rtol=1e-3, atol=1e-3)
        # vec is an eigenvector for the smallest eigenvalue
        res = np.einsum("nij,nj->ni", A, vec) - ev[:, :1] * vec
        assert np.abs(res).max() < 1e-2

    def test_plane_normals(self):
        rng = np.random.default_rng(6)
        xy = rng.uniform(-1, 1, size=(400, 2)).astype(np.float32)
        xyz = np.concatenate([xy, np.full((400, 1), 0.5, np.float32)], axis=1)
        cloud = PointCloud.from_numpy(xyz)
        out = estimate_normals(cloud, k=10, viewpoint=jnp.array([0.0, 0.0, 10.0]))
        nrm = np.asarray(out.channel("normal"))[:400]
        curv = np.asarray(out.channel("curvature"))[:400]
        np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-3)
        assert (nrm[:, 2] > 0).all()  # flipped toward viewpoint above
        assert curv.max() < 1e-3

    def test_grid_path_on_sphere(self):
        rng = np.random.default_rng(7)
        v = rng.normal(size=(600, 3)).astype(np.float32)
        xyz = v / np.linalg.norm(v, axis=1, keepdims=True)
        cloud = PointCloud.from_numpy(xyz)
        out = estimate_normals(cloud, k=8, use_grid=True, cell_size=0.3,
                               viewpoint=jnp.zeros(3))
        nrm = np.asarray(out.channel("normal"))[:600]
        # normal should be radial (pointing inward toward viewpoint at origin)
        cosine = np.abs((nrm * xyz).sum(1))
        assert np.median(cosine) > 0.99


class TestTiledNN:
    def test_tiled_matches_bruteforce_exactly(self):
        """Tiled dense NN (ops/tiled_nn.py): per-tile-centered norm
        identity must agree with brute force to the last f32 bit on a
        scan-like surface."""
        from mapping_private_tpu.ops.tiled_nn import build_tiles, tiled_nn_1nn

        rng = np.random.default_rng(11)
        n = 10000
        xy = rng.uniform(0, 5, (n, 2))
        z = 0.3 * np.sin(xy[:, 0] * 2) + rng.normal(0, 0.005, n)
        tgt = np.column_stack([xy, z]).astype(np.float32)
        src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
        mask = jnp.ones((n,), bool)
        tile = 0.25
        lo = tgt.min(0) - 2 * tile
        dims = tuple(int(v) for v in np.ceil((tgt.max(0) + 2 * tile - lo) / tile))
        tt = build_tiles(jnp.asarray(tgt), mask, lo, tile, dims, 128)
        qt = build_tiles(jnp.asarray(src), mask, lo, tile, dims, 128)
        gi, gs = tiled_nn_1nn(tt, qt, jnp.asarray(src))
        bi, bs = knn_bruteforce(jnp.asarray(src), jnp.asarray(tgt), mask, k=1)
        gi = np.asarray(gi)
        assert (gi >= 0).all()  # no overflow at this density
        t64, s64 = tgt.astype(np.float64), src.astype(np.float64)
        d_g = np.sum((s64 - t64[gi]) ** 2, axis=1)
        d_b = np.sum((s64 - t64[np.asarray(bi[:, 0])]) ** 2, axis=1)
        assert float(np.max(d_g - d_b)) <= 0.0

    def test_compact_matches_bruteforce_exactly(self):
        """Occupied-tiles-only engine (CompactTiles): same exactness bar
        as the dense lattice, at a fraction of the work."""
        from mapping_private_tpu.ops.tiled_nn import (
            build_compact_tiles, compact_nn_1nn,
        )

        rng = np.random.default_rng(13)
        n = 10000
        xy = rng.uniform(0, 5, (n, 2))
        z = 0.3 * np.sin(xy[:, 0] * 2) + rng.normal(0, 0.005, n)
        tgt = np.column_stack([xy, z]).astype(np.float32)
        src = (tgt + rng.normal(0, 0.01, tgt.shape)).astype(np.float32)
        mask = jnp.ones((n,), bool)
        tile = 0.25
        lo = tgt.min(0) - 2 * tile
        dims = tuple(int(v) for v in np.ceil((tgt.max(0) + 2 * tile - lo) / tile))
        cell = np.floor((tgt - lo) / tile).astype(np.int64)
        occ = len(np.unique(
            (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]))
        mt = 1 << int(np.ceil(np.log2(2 * occ)))
        ct = build_compact_tiles(jnp.asarray(tgt), mask, lo, tile, dims, 128, mt)
        cq = build_compact_tiles(jnp.asarray(src), mask, lo, tile, dims, 128, mt)
        gi, gs = compact_nn_1nn(ct, cq)
        bi, _ = knn_bruteforce(jnp.asarray(src), jnp.asarray(tgt), mask, k=1)
        gi = np.asarray(gi)
        assert (gi >= 0).all()
        t64, s64 = tgt.astype(np.float64), src.astype(np.float64)
        d_g = np.sum((s64 - t64[gi]) ** 2, axis=1)
        d_b = np.sum((s64 - t64[np.asarray(bi[:, 0])]) ** 2, axis=1)
        assert float(np.max(d_g - d_b)) <= 0.0

    def test_compact_spill_contract(self):
        """Queries in tiles beyond max_tiles come back −1 (no wrong
        answers from silent truncation of the query's own tile)."""
        from mapping_private_tpu.ops.tiled_nn import (
            build_compact_tiles, compact_nn_1nn,
        )

        rng = np.random.default_rng(14)
        n = 2000
        pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        mask = jnp.ones((n,), bool)
        tile = 0.5
        lo = pts.min(0) - 2 * tile
        dims = tuple(int(v) for v in np.ceil((pts.max(0) + 2 * tile - lo) / tile))
        ct = build_compact_tiles(jnp.asarray(pts), mask, lo, tile, dims, 64, 16)
        cq = build_compact_tiles(jnp.asarray(pts), mask, lo, tile, dims, 64, 16)
        gi, _ = compact_nn_1nn(ct, cq)
        gi = np.asarray(gi)
        spilled = np.asarray(cq.slot_of_pt) < 0
        assert spilled.any()  # 16 slots can't hold this scene
        assert (gi[spilled] == -1).all()
        # answered self-queries must find themselves (distance 0)
        ok = gi >= 0
        assert (gi[ok] == np.arange(n)[ok]).all()

    def test_tiled_icp_backend(self):
        """ICP with the tiled backend converges on a shifted scan."""
        from mapping_private_tpu.registration.icp import icp_point_to_plane  # noqa
        from mapping_private_tpu.core.se3 import se3_exp

        rng = np.random.default_rng(12)
        n = 8000
        xy = rng.uniform(0, 3, (n, 2))
        z = 0.3 * np.sin(xy[:, 0] * 2) + 0.2 * np.cos(xy[:, 1] * 3)
        tgt = np.column_stack([xy, z]).astype(np.float32)
        dzdx = 0.6 * np.cos(xy[:, 0] * 2)
        dzdy = -0.6 * np.sin(xy[:, 1] * 3)
        nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)])
        nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)
        xi = jnp.asarray([0.02, -0.01, 0.005, 0.004, 0.0, 0.006], jnp.float32)
        T_gt = np.asarray(se3_exp(xi))
        src = (tgt @ np.linalg.inv(T_gt)[:3, :3].T
               + np.linalg.inv(T_gt)[:3, 3]).astype(np.float32)
        from mapping_private_tpu.registration.icp import (
            icp_point_to_plane_tiled,
        )

        res = icp_point_to_plane_tiled(
            jnp.asarray(src), jnp.ones((n,), bool),
            jnp.asarray(tgt), jnp.ones((n,), bool), jnp.asarray(nrm),
            tile_size=0.25, cap_per_cell=128, iters=8, max_corr_dist=0.3,
        )
        err = np.abs(np.asarray(res.transform) - T_gt).max()
        assert err < 5e-3, err


def test_voxel_downsample_dense_matches_sorted():
    """Sort-free dense-scatter downsample ≡ the sort-based path (same
    cells, same means, channels carried) on a bounded scene."""
    from mapping_private_tpu.ops.voxel import (
        voxel_downsample, voxel_downsample_dense,
    )

    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1.0, (5000, 3)).astype(np.float32)
    c = PointCloud.from_numpy(pts).with_channel(
        "r", jnp.arange(c_cap := 5120, dtype=jnp.float32) % 7
    )
    a = voxel_downsample(c, 0.05, 4096)
    b = voxel_downsample_dense(c, 0.05, np.zeros(3, np.float32),
                               (20, 20, 20), 4096)
    assert int(a.mask.sum()) == int(b.mask.sum())
    ax = np.asarray(a.padded_xyz())[np.asarray(a.mask)]
    bx = np.asarray(b.padded_xyz())[np.asarray(b.mask)]
    ar = np.asarray(a.channels["r"])[np.asarray(a.mask)]
    br = np.asarray(b.channels["r"])[np.asarray(b.mask)]
    ka, kb = np.lexsort(ax.T), np.lexsort(bx.T)
    np.testing.assert_allclose(ax[ka], bx[kb], atol=1e-5)
    np.testing.assert_allclose(ar[ka], br[kb], atol=1e-5)


class TestRefreshCompactCoords:
    def test_no_motion_equals_rebuild(self):
        """Refreshing with unchanged coordinates reproduces the build's
        xyz blocks exactly (the segmented tiled-ICP invariant)."""
        import jax.numpy as jnp
        from mapping_private_tpu.ops.tiled_nn import (
            build_compact_tiles, refresh_compact_coords)

        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 2, (4096, 3)).astype(np.float32)
        mask = np.ones(4096, bool)
        mask[::5] = False
        ct = build_compact_tiles(
            jnp.asarray(pts), jnp.asarray(mask), np.float32([-0.2] * 3),
            0.25, (10, 10, 10), 64, 512)
        rf = refresh_compact_coords(ct, jnp.asarray(pts))
        np.testing.assert_array_equal(np.asarray(rf.xyz), np.asarray(ct.xyz))

    def test_small_motion_keeps_exactness(self):
        """Moved queries re-scattered into stale slots still find their
        true NN while motion stays under tile_size (the documented
        guarantee radius tile_size − δ)."""
        import jax.numpy as jnp
        from mapping_private_tpu.ops.tiled_nn import (
            build_compact_tiles, compact_nn_1nn, refresh_compact_coords)

        rng = np.random.default_rng(1)
        tgt = rng.uniform(0, 2, (4096, 3)).astype(np.float32)
        ones = np.ones(4096, bool)
        lo = np.float32([-0.3] * 3)
        args = (lo, 0.3, (9, 9, 9), 64, 512)
        tt = build_compact_tiles(jnp.asarray(tgt), jnp.asarray(ones), *args)
        q0 = (tgt + 0.002).astype(np.float32)
        qt = build_compact_tiles(jnp.asarray(q0), jnp.asarray(ones), *args)
        # move queries by 3 cm (≪ 30 cm tile) WITHOUT re-bucketing
        q1 = (q0 + np.float32([0.02, -0.015, 0.01])).astype(np.float32)
        idx, sq = compact_nn_1nn(tt, refresh_compact_coords(qt, jnp.asarray(q1)))
        idx, sq = np.asarray(idx), np.asarray(sq)
        ok = idx >= 0
        assert ok.mean() > 0.99
        # exact: matches brute-force NN distances (chunked)
        chunk = 512
        best = np.empty(ok.sum())
        qv = q1[ok]
        for a in range(0, len(qv), chunk):
            d2 = ((qv[a:a+chunk, None, :] - tgt[None, :, :]) ** 2).sum(-1)
            best[a:a+chunk] = d2.min(1)
        np.testing.assert_allclose(sq[ok], best, atol=1e-5)

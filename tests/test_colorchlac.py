import numpy as np
import jax.numpy as jnp

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.core.voxelgrid import voxelize
from mapping_private_tpu.features.colorchlac import (
    NEIGHBOR_OFFSETS_13,
    colorchlac117,
    colorchlac981,
    rotate_feature_981,
)
from mapping_private_tpu.features.rsd import grsd20_from_types, get_type


def _loop_chlac117(occ, rgb, thr=(127, 127, 127)):
    """Direct per-voxel loop oracle following the reference's
    addColorCHLAC_{0,1}{,_bin} RI layout (color_chlac.hpp:1566-1758)."""
    X, Y, Z = occ.shape
    hist = np.zeros(117)
    UT = [(i, j) for i in range(6) for j in range(i, 6)]
    BIN_PAIRS = [(0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (1, 3), (1, 4), (1, 5),
                 (2, 4), (2, 5), (3, 4), (3, 5)]

    def chans(v):
        r, g, b = rgb[v]
        return np.array([r, 255 - r, g, 255 - g, b, 255 - b], float)

    def binch(v):
        r, g, b = rgb[v]
        br, bg, bb = float(r > thr[0]), float(g > thr[1]), float(b > thr[2])
        return np.array([br, 1 - br, bg, 1 - bg, bb, 1 - bb])

    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if not occ[x, y, z]:
                    continue
                u = chans((x, y, z))
                w = binch((x, y, z))
                hist[0:6] += u / 255.0
                for k, (i, j) in enumerate(UT):
                    hist[42 + k] += u[i] * u[j] / 65025.0
                hist[63:69] += w
                for k, (i, j) in enumerate(BIN_PAIRS):
                    hist[105 + k] += w[i] * w[j]
                for dx, dy, dz in NEIGHBOR_OFFSETS_13:
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if not (0 <= nx < X and 0 <= ny < Y and 0 <= nz < Z):
                        continue
                    if not occ[nx, ny, nz]:
                        continue
                    un = chans((nx, ny, nz))
                    wn = binch((nx, ny, nz))
                    for c1 in range(6):
                        for c2 in range(6):
                            hist[6 + c1 * 6 + c2] += u[c1] * un[c2] / 845325.0
                            hist[69 + c1 * 6 + c2] += w[c1] * wn[c2] / 13.0
    return hist


def _random_grid(seed=0, dims=(6, 5, 4), p=0.5):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(size=dims) < p
    rgb = {}
    for v in np.argwhere(occ):
        rgb[tuple(v)] = rng.integers(0, 256, 3).astype(float)
    return occ, rgb


def _grid_from_arrays(occ, rgb):
    """Build a VoxelGrid whose voxel (x,y,z) has exactly the given color."""
    pts, rs, gs, bs = [], [], [], []
    for v, c in rgb.items():
        pts.append((np.array(v) + 0.5) * 0.1)
        rs.append(c[0]); gs.append(c[1]); bs.append(c[2])
    cloud = PointCloud.from_numpy(
        np.array(pts, np.float32),
        channels={"r": np.array(rs), "g": np.array(gs), "b": np.array(bs)},
    )
    return voxelize(cloud, 0.1, jnp.zeros(3), occ.shape, channels=("r", "g", "b"))


def test_chlac117_matches_loop_oracle():
    occ, rgb = _random_grid()
    vg = _grid_from_arrays(occ, rgb)
    got = np.asarray(colorchlac117(vg))
    want = _loop_chlac117(occ, rgb)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chlac117_rotation_invariance():
    occ, rgb = _random_grid(seed=1, dims=(5, 5, 5))
    vg = _grid_from_arrays(occ, rgb)
    f = np.asarray(colorchlac117(vg))
    # rotate grid 90° about z: (x,y,z) -> (y, X-1-x, z)... use numpy rot90
    occ_r = np.rot90(occ, axes=(0, 1))
    rgb_r = {}
    X = occ.shape[0]
    for (x, y, z), c in rgb.items():
        rgb_r[(y, X - 1 - x, z)] = c
    vg_r = _grid_from_arrays(occ_r, rgb_r)
    f_r = np.asarray(colorchlac117(vg_r))
    # Exactly invariant parts: 0th order, center pairs, bin counts.
    # The neighbor-pair 6×6 blocks are invariant only in their symmetric
    # part M+Mᵀ (offsets that flip sign under the rotation transpose the
    # color pair) — matches the reference's construction.
    for sl in (slice(0, 6), slice(42, 63), slice(63, 69), slice(105, 117)):
        np.testing.assert_allclose(f[sl], f_r[sl], rtol=1e-4, atol=1e-4)
    for base in (6, 69):
        M = f[base : base + 36].reshape(6, 6)
        Mr = f_r[base : base + 36].reshape(6, 6)
        np.testing.assert_allclose(M + M.T, Mr + Mr.T, rtol=1e-4, atol=1e-4)


def test_chlac981_rotation_permutation():
    occ, rgb = _random_grid(seed=2, dims=(5, 5, 5))
    vg = _grid_from_arrays(occ, rgb)
    f = colorchlac981(vg)
    # +90° about z in this package's convention: v' = R·v (+ shift), i.e.
    # (x, y) → (X−1−y, x)
    X = occ.shape[0]
    occ_r = np.zeros_like(occ)
    rgb_r = {}
    for (x, y, z), c in rgb.items():
        occ_r[X - 1 - y, x, z] = True
        rgb_r[(X - 1 - y, x, z)] = c
    vg_r = _grid_from_arrays(occ_r, rgb_r)
    f_r = np.asarray(colorchlac981(vg_r))
    pred = np.asarray(rotate_feature_981(f, "z"))
    np.testing.assert_allclose(f_r, pred, rtol=1e-4, atol=1e-4)


def test_chlac981_117_consistency():
    # summing the per-offset blocks of 981 must reproduce the 117 pair part
    occ, rgb = _random_grid(seed=3)
    vg = _grid_from_arrays(occ, rgb)
    f981 = np.asarray(colorchlac981(vg))
    f117 = np.asarray(colorchlac117(vg))
    pair_sum = f981[6:474].reshape(13, 36).sum(0) / 13.0  # N1 vs N1_RI scale
    np.testing.assert_allclose(pair_sum, f117[6:42], rtol=1e-4, atol=1e-4)


def test_grsd20_loop_oracle():
    rng = np.random.default_rng(4)
    dims = (5, 4, 4)
    occ = rng.uniform(size=dims) < 0.6
    types = rng.integers(0, 5, size=dims)
    from mapping_private_tpu.features.rsd import NEIGHBOR_OFFSETS_26

    M = np.zeros((6, 6))
    X, Y, Z = dims
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if not occ[x, y, z]:
                    continue
                s = types[x, y, z]
                for dx, dy, dz in NEIGHBOR_OFFSETS_26:
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if 0 <= nx < X and 0 <= ny < Y and 0 <= nz < Z and occ[nx, ny, nz]:
                        t = types[nx, ny, nz]
                    else:
                        t = 5
                    M[s, t] += 1
    want = np.array([M[i, j] for i in range(6) for j in range(i, 6)])[:20]
    got = np.asarray(
        grsd20_from_types(jnp.asarray(types), jnp.asarray(occ))
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_get_type_thresholds():
    r_min = jnp.array([0.15, 0.05, 0.01, 0.05, 0.05])
    r_max = jnp.array([0.2, 0.18, 0.05, 0.08, 0.15])
    types = np.asarray(get_type(r_min, r_max))
    assert list(types) == [1, 2, 0, 3, 4]  # PLANE, CYLINDER, NOISE, SPHERE, EDGE

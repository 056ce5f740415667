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


# ---------------------------------------------------------------------------
# Reference interleaved 981 layout (artifact interop)
# ---------------------------------------------------------------------------

def _ref_bin_981(base, c1, c2, k):
    """Reference interleaved bin position (color_chlac.hpp:296-801;
    stride pattern confirmed at c3_hlac/src/c3_hlac.cpp:86-160)."""
    row = base + 78 * c1
    return row + (9 * c2 + k if k < 9 else 54 + 4 * c2 + (k - 9))


def _loop_chlac981_reference(occ, rgb, thr=(127, 127, 127)):
    """Per-voxel loop oracle emitting the REFERENCE bin order directly."""
    X, Y, Z = occ.shape
    hist = np.zeros(981)
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
                u, w = chans((x, y, z)), binch((x, y, z))
                hist[0:6] += u / 255.0
                for n, (i, j) in enumerate(UT):
                    hist[474 + n] += u[i] * u[j] / 65025.0
                hist[495:501] += w
                for n, (i, j) in enumerate(BIN_PAIRS):
                    hist[969 + n] += w[i] * w[j]
                for k, (dx, dy, dz) in enumerate(NEIGHBOR_OFFSETS_13):
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if not (0 <= nx < X and 0 <= ny < Y and 0 <= nz < Z):
                        continue
                    if not occ[nx, ny, nz]:
                        continue
                    un, wn = chans((nx, ny, nz)), binch((nx, ny, nz))
                    for c1 in range(6):
                        for c2 in range(6):
                            hist[_ref_bin_981(6, c1, c2, k)] += u[c1] * un[c2] / 65025.0
                            hist[_ref_bin_981(501, c1, c2, k)] += w[c1] * wn[c2]
    return hist


def test_chlac981_reference_layout_oracle():
    from mapping_private_tpu.features.colorchlac import to_reference_layout_981

    occ, rgb = _random_grid(seed=5, dims=(5, 5, 4))
    vg = _grid_from_arrays(occ, rgb)
    got = np.asarray(to_reference_layout_981(colorchlac981(vg)))
    want = _loop_chlac981_reference(occ, rgb)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chlac981_reference_layout_roundtrip():
    from mapping_private_tpu.features.colorchlac import (
        from_reference_layout_981,
        to_reference_layout_981,
    )

    f = jnp.asarray(np.random.default_rng(6).uniform(size=981).astype(np.float32))
    back = np.asarray(from_reference_layout_981(to_reference_layout_981(f)))
    np.testing.assert_allclose(back, np.asarray(f))


def _parse_reference_rotation_tables():
    """Parse the hand-unrolled rotateFeature90 tables from the reference
    source (c3_hlac/src/c3_hlac.cpp, dim-981 case) into permutations over
    the full 981 vector.  Data parity check, analogous to the golden-PCD
    corpus tests."""
    import pathlib
    import re

    src = pathlib.Path("/root/reference/c3_hlac/src/c3_hlac.cpp").read_text()
    # isolate the sub-table that handles one 495/486-dim half
    start = src.index("case DIM_C3HLAC_981_BIN_1_3:")
    end = src.index("  default:", start)
    body = src[start:end]
    blocks = re.split(r"case R_MODE_(\d):", body)
    tables = {}
    line_re = re.compile(
        r"output\[\s*(\d+)\s*\+\s*([ij])\*(\d)\s*\+\s*([ij])\*78\s*\]\s*=\s*"
        r"input\[\s*(\d+)\s*\+\s*([ij])\*(\d)\s*\+\s*([ij])\*78\s*\]"
    )
    for mode_id, chunk in zip(blocks[1::2], blocks[2::2]):
        assigns = line_re.findall(chunk.split("break;")[0])
        assert len(assigns) == 13, (mode_id, len(assigns))
        half = {}  # out_idx -> in_idx over one half-vector
        for i in range(6):
            for j in range(6):
                env = {"i": i, "j": j}
                for oa, ov, om, ov2, ia, iv, im, iv2 in assigns:
                    out = int(oa) + env[ov] * int(om) + env[ov2] * 78
                    inp = int(ia) + env[iv] * int(im) + env[iv2] * 78
                    half[out] = inp
        perm = np.arange(981)
        for base in (0, 495):
            for out, inp in half.items():
                assert 6 <= out < 474 and 6 <= inp < 474
                perm[base + out] = base + inp
        tables[int(mode_id)] = perm
    return tables


def _ref_rotation_ground_truth(R):
    """Reference-layout permutation for 90°-rotation matrix R, derived
    from the correlation identity: the rotated grid's bin (c1,c2,δ)
    equals the original's bin at R⁻¹δ, or — when R⁻¹δ leaves the
    half-neighborhood — the (c2,c1) bin at −R⁻¹δ.  (The transpose rule
    is physically validated by test_chlac981_rotation_permutation.)"""
    offs = [np.array(d) for d in NEIGHBOR_OFFSETS_13]
    oi = {tuple(d): k for k, d in enumerate(NEIGHBOR_OFFSETS_13)}
    perm = np.arange(981)
    for k, d in enumerate(offs):
        rd = R.T @ d
        swap = False
        if tuple(rd) not in oi:
            rd, swap = -rd, True
        ks = oi[tuple(rd)]
        for c1 in range(6):
            for c2 in range(6):
                for base in (6, 501):
                    perm[_ref_bin_981(base, c1, c2, k)] = _ref_bin_981(
                        base, c2 if swap else c1, c1 if swap else c2, ks
                    )
    return perm


def test_chlac981_rotation_matches_reference_tables():
    """P · rot_own · P⁻¹ must equal the reference's hand-written
    rotation tables (c3_hlac.cpp:85-160) on every k<9 neighbor bin and
    all identity bins (840 of 981 entries — an independent check of the
    derived layout permutation P).

    Known reference bug: in the 24 k≥9 bins the hand-written tables
    TOGGLE the (c1,c2) color transpose relative to the mathematically
    correct rotation (which this package's rotate_feature_981 applies,
    validated against physical grid rotation in
    test_chlac981_rotation_permutation).  The test pins that exact
    discrepancy so any other divergence still fails."""
    from mapping_private_tpu.features.colorchlac import (
        _rotation_permutation_981,
        _perm_own_to_reference_981,
    )

    tables = _parse_reference_rotation_tables()
    assert {1, 2, 3}.issubset(set(tables))
    P = _perm_own_to_reference_981()
    Pinv = np.argsort(P)

    # bins where the reference tables are trustworthy: everything except
    # the k>=9 neighbor region (positions row+54..row+77 per row/half)
    k9 = np.zeros(981, bool)
    for c1 in range(6):
        for c2 in range(6):
            for k in range(9, 13):
                for base in (6, 501):
                    k9[_ref_bin_981(base, c1, c2, k)] = True

    rots = {
        "x": np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]]),
        "y": np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]]),
        "z": np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]]),
    }
    # all 24 rotations by closure
    group = {}
    frontier = [(np.eye(3, dtype=int), "e")]
    group[frontier[0][0].tobytes()] = frontier[0]
    while frontier:
        nxt = []
        for M, name in frontier:
            for gn, G in rots.items():
                Q = G @ M
                if Q.tobytes() not in group:
                    group[Q.tobytes()] = (Q, name + gn)
                    nxt.append((Q, name + gn))
        frontier = nxt
    assert len(group) == 24

    f = np.random.default_rng(7).uniform(size=981)
    # R_MODE_1 and R_MODE_4 are the ±90° z rotations; their hand tables
    # cover every one of the 981 destination bins and match the derived
    # ground truth exactly, except that entries SOURCED from a k>=9 bin
    # have the (c1,c2) transpose toggled (the documented reference bug).
    matched = {}
    for mid in (1, 4):
        tab = tables[mid]
        for Q, name in group.values():
            gt = _ref_rotation_ground_truth(Q)
            pred = np.array([_swap_c_981(g) if k9[g] else g for g in gt])
            if np.array_equal(pred, tab):
                matched[mid] = name
                break
    assert sorted(matched.values()) == ["ez", "ezzz"], matched
    # R_MODE_2/3 (the x/y-family tables) additionally contain axis-mixing
    # errors (~336 entries disagree with EVERY rotation-group element) —
    # they are reference bugs, not asserted here.
    # own-layout rotations conjugated by P must equal the ground truths
    for mode, R in rots.items():
        lhs = f[_rotation_permutation_981(mode)][P]
        rhs = f[P][_ref_rotation_ground_truth(R)]
        np.testing.assert_array_equal(lhs, rhs)


def _swap_c_981(b):
    """Transpose (c1,c2) of a reference-layout neighbor bin index."""
    base = 6 if b < 474 else 501
    r = b - base
    c1, w = divmod(r, 78)
    if w < 54:
        c2, k = divmod(w, 9)
        k = k
    else:
        c2, k = divmod(w - 54, 4)
        k = 9 + k
    return _ref_bin_981(base, c2, c1, k)

"""Fit the golden-corpus GRSD variant: (get_type variant, enum permutation,
bin layout, normalizer) such that our voxel r_min/r_max reproduce the gold
20-dim GRSD for every non-axis-aligned shape."""
import itertools
import numpy as np

from mapping_private_tpu.io import load_pcd, load_pcd_arrays
from mapping_private_tpu.features.extract import (
    voxelize_for_features, NORMALS_RADIUS, RSD_RADIUS,
)
from mapping_private_tpu.features.rsd import rsd_radii_pcl
from mapping_private_tpu.ops.normals import estimate_normals_radius
import jax.numpy as jnp

BASE = "/root/reference/color_chlac/demos/shape_data"
SHAPES = ["cone", "cylinder", "sphere", "torus"]
COLOR = "red"

# label order in our M: 0..4 = NOISE PLANE CYLINDER SPHERE EDGE, 5 = EMPTY
LABELS = ["NOISE", "PLANE", "CYLINDER", "SPHERE", "EDGE", "EMPTY"]


def types_new(rmin, rmax):
    return np.where(rmin > 0.100, 1,
           np.where(rmax > 0.175, 2,
           np.where(rmin < 0.015, 0,
           np.where(rmax - rmin < 0.050, 3, 4))))


def types_old(rmin, rmax):
    return np.where(rmin > 0.066, 1,
           np.where((rmin < 0.030) & (rmax < 0.050), 0,
           np.where(rmax - rmin < 0.02, 3,
           np.where(rmin < 0.030, 4, 2))))


def transition_matrix(tgrid, occ, offsets):
    """M[s,n] counts over given offsets; neighbor empty/out-of-grid -> 5."""
    X, Y, Z = occ.shape
    M = np.zeros((6, 6), np.int64)
    t = np.where(occ, tgrid, -1)
    for dx, dy, dz in offsets:
        nb = np.full_like(t, -1)
        sx = slice(max(0, -dx), min(X, X - dx))
        sy = slice(max(0, -dy), min(Y, Y - dy))
        sz = slice(max(0, -dz), min(Z, Z - dz))
        tx = slice(max(0, dx), min(X, X + dx))
        ty = slice(max(0, dy), min(Y, Y + dy))
        tz = slice(max(0, dz), min(Z, Z + dz))
        nb[sx, sy, sz] = t[tx, ty, tz]
        src = t[occ]
        nbo = nb[occ]
        nbo = np.where(nbo < 0, 5, nbo)
        np.add.at(M, (src, nbo), 1)
    return M


OFF13 = [(i, j, -1) for i in (-1, 0, 1) for j in (-1, 0, 1)] + \
        [(i, -1, 0) for i in (-1, 0, 1)] + [(-1, 0, 0)]
OFF26 = OFF13 + [(-a, -b, -c) for a, b, c in OFF13]

UPPER = [(i, j) for i in range(6) for j in range(i, 6)][:20]
LOWER = [(i, j) for i in range(1, 6) for j in range(0, i + 1)]
LAYOUTS = {"upper": UPPER, "lower": LOWER}
NORMS = {"5/104": 5 / 104, "5/52": 5 / 52, "20/26": 20 / 26, "1": 1.0}

mats = {}
golds = {}
for shape in SHAPES:
    src = f"{BASE}/noiseless_{shape}_{COLOR}.pcd"
    gf = f"{BASE}/noiseless_{shape}_{COLOR}_GRSD_CCHLAC.pcd"
    cloud = load_pcd(src)
    gold = load_pcd_arrays(gf)["vfh"][0][:20]
    grid = voxelize_for_features(cloud)
    cloud_n = estimate_normals_radius(cloud, radius=NORMALS_RADIUS, k_cap=544)
    normals = cloud_n.channel("normal")
    centroids = grid.mean("_xyz").reshape(-1, 3)
    occ_flat = grid.occupancy().reshape(-1)
    r_min, r_max = rsd_radii_pcl(
        centroids, occ_flat, cloud.padded_xyz(), cloud.mask, normals,
        radius=RSD_RADIUS, k=192,
    )
    rmin = np.asarray(r_min).reshape(grid.dims)
    rmax = np.asarray(r_max).reshape(grid.dims)
    occ = np.asarray(grid.occupancy())
    mats[shape] = {}
    for vname, fn in (("new", types_new), ("old", types_old)):
        tg = fn(rmin, rmax)
        for oname, offs in (("13", OFF13), ("26", OFF26)):
            mats[shape][(vname, oname)] = transition_matrix(tg, occ, offs)
    golds[shape] = gold
    print(shape, "gold nonzero:", {i: round(float(v), 4) for i, v in enumerate(gold) if v})

found = []
for vname in ("new", "old"):
    for oname in ("13", "26"):
        for perm in itertools.permutations(range(6)):
            # perm maps our label index -> gold class index
            ok_all = True
            for lname, layout in LAYOUTS.items():
                for nname, nv in NORMS.items():
                    ok = True
                    for shape in SHAPES:
                        M = mats[shape][(vname, oname)]
                        Mp = np.zeros_like(M)
                        for i in range(6):
                            for j in range(6):
                                Mp[perm[i], perm[j]] = M[i, j]
                        feat = np.array([Mp[i, j] for i, j in layout], float) * nv
                        if not np.allclose(feat, golds[shape], rtol=1e-4, atol=1e-3):
                            ok = False
                            break
                    if ok:
                        found.append((vname, oname, perm, lname, nname))
                        print("MATCH:", vname, oname, perm, lname, nname)
if not found:
    print("no exact match; trying per-shape best for diagnosis (new/26):")
    # diagnose: print our matrices
    for shape in SHAPES:
        print("=", shape)
        for key in (("new", "26"), ("old", "26")):
            M = mats[shape][key]
            print(key, "nonzero:", {(LABELS[i], LABELS[j]): int(M[i, j])
                  for i in range(6) for j in range(6) if M[i, j]})
        print("gold*104/5:", {i: round(float(v) * 104 / 5, 2) for i, v in enumerate(golds[shape]) if v})

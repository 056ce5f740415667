"""Bit-parity against the reference's golden feature corpus.

color_chlac/demos/shape_data pairs each shape PCD with the 137-dim
GRSD+ColorCHLAC feature the original C++ produced.  The ColorCHLAC-117
part must match exactly (up to two documented legacy artifacts: the
halved 0th-order normalizers, and ≤1/255 color noise from old PCL's
bit-level averaging of packed rgb floats).

Axis-aligned shapes (cube/dice/plane/table) are excluded: their faces lie
exactly on voxel boundaries, so the original's float voxel binning split
each face into two layers nondeterministically — unreproducible by
construction (observed: 571 vs 300 occupied voxels on the same cube).
"""
import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.parametrize(
    "shape",
    ["cone", "cylinder", "sphere", "torus"],
)

COLORS = ["black", "blue", "green", "orange", "purple", "red", "yellow"]


def test_colorchlac117_golden(reference_root, shape):
    from mapping_private_tpu.io import load_pcd, load_pcd_arrays
    from mapping_private_tpu.features.extract import extract_colorchlac117

    base = reference_root / "color_chlac/demos/shape_data"
    n_checked = 0
    for color in COLORS:
        src = base / f"noiseless_{shape}_{color}.pcd"
        gf = base / f"noiseless_{shape}_{color}_GRSD_CCHLAC.pcd"
        if not src.exists() or not gf.exists():
            continue
        cloud = load_pcd(str(src))
        gold = load_pcd_arrays(str(gf))["vfh"][0][20:]
        mine = np.asarray(
            extract_colorchlac117(cloud, legacy_zeroth_scale=True)
        )
        np.testing.assert_allclose(mine, gold, rtol=2e-3, atol=0.02)
        n_checked += 1
    assert n_checked >= 5


def test_grsd20_golden(reference_root, shape):
    """GRSD-20 bit-parity with the golden corpus via the reconstructed
    era chain (voxel_types_era + grsd20_era; derivation in
    scripts/grsd_oracle.py — 28/28 shape×color pairs exact).  A single
    misclassified voxel shifts an integer count, so the tolerance below
    effectively demands every voxel's surface type match."""
    from mapping_private_tpu.io import load_pcd, load_pcd_arrays
    from mapping_private_tpu.features.extract import extract_grsd_cchlac

    base = reference_root / "color_chlac/demos/shape_data"
    n_checked = 0
    for color in COLORS:
        src = base / f"noiseless_{shape}_{color}.pcd"
        gf = base / f"noiseless_{shape}_{color}_GRSD_CCHLAC.pcd"
        if not src.exists() or not gf.exists():
            continue
        cloud = load_pcd(str(src))
        gold = load_pcd_arrays(str(gf))["vfh"][0][:20]
        mine = np.asarray(extract_grsd_cchlac(cloud, legacy_zeroth_scale=True))[:20]
        np.testing.assert_allclose(mine, gold, atol=0.01)
        n_checked += 1
    assert n_checked >= 5

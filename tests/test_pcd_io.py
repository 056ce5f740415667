import numpy as np
import pytest

from mapping_private_tpu.io import load_pcd, load_pcd_arrays, save_pcd


def test_legacy_columns_ascii(reference_root):
    path = reference_root / "cloud_algos/data/cylinder_small.pcd"
    arrays = load_pcd_arrays(str(path))
    assert {"x", "y", "z", "sp"} <= set(arrays)
    assert arrays["x"].shape == (384,)
    np.testing.assert_allclose(arrays["x"][0], 0.034607, rtol=1e-5)
    cloud = load_pcd(str(path))
    assert int(cloud.count()) == 384
    assert cloud.capacity % 128 == 0


def test_v7_binary_rgb(reference_root):
    path = reference_root / "color_chlac/demos/shape_data/noiseless_cone_black.pcd"
    arrays = load_pcd_arrays(str(path))
    assert arrays["x"].shape == (5415,)
    assert "r" in arrays and "g" in arrays and "b" in arrays
    assert arrays["r"].min() >= 0 and arrays["r"].max() <= 255
    finite = np.isfinite(np.stack([arrays["x"], arrays["y"], arrays["z"]], -1)).all(1)
    cloud = load_pcd(str(path))
    assert int(cloud.count()) == finite.sum()
    rgb = cloud.rgb()
    assert rgb is not None and rgb.shape == (cloud.capacity, 3)


def test_v7_feature_vector(reference_root):
    path = (
        reference_root
        / "color_chlac/demos/shape_data/noiseless_cone_black_GRSD_CCHLAC.pcd"
    )
    arrays = load_pcd_arrays(str(path))
    assert arrays["vfh"].shape == (1, 137)


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(size=(100,)).astype(np.float32)
    save_pcd(str(tmp_path / "t.pcd"), {"xyz": xyz, "intensity": inten})
    back = load_pcd_arrays(str(tmp_path / "t.pcd"))
    np.testing.assert_allclose(back["x"], xyz[:, 0], atol=1e-5)
    np.testing.assert_allclose(back["intensity"], inten, atol=1e-5)


def test_missing_xyz_raises(tmp_path, reference_root):
    path = (
        reference_root
        / "color_chlac/demos/shape_data/noiseless_cone_black_GRSD_CCHLAC.pcd"
    )
    with pytest.raises(ValueError):
        load_pcd(str(path))

"""Batch PCD utility CLI (apps/cloud_ops.py — rot_trans_scale /
cloud_operations / process_clouds counterpart) on real reference PCDs."""
import os

import numpy as np
import pytest

from mapping_private_tpu.apps.cloud_ops import _euler_matrix, main
from mapping_private_tpu.io.pcd import load_pcd_arrays

CYL = "/root/reference/cloud_algos/data/cylinder_small.pcd"


def _xyz(path):
    a = load_pcd_arrays(path)
    return np.stack([a["x"], a["y"], a["z"]], 1)


class TestTransform:
    def test_rigid_roundtrip(self, tmp_path):
        out = str(tmp_path)
        assert main(["transform", "--x", "0.1", "--y", "-0.2", "--yaw",
                     "0.3", "--out-dir", out, CYL]) == 0
        moved = _xyz(os.path.join(out, "cylinder_small_tf.pcd"))
        orig = _xyz(CYL)
        R = _euler_matrix(0, 0, 0.3)
        np.testing.assert_allclose(
            moved, orig @ R.T + [0.1, -0.2, 0.0], atol=1e-5)

    def test_scale(self, tmp_path):
        out = str(tmp_path)
        assert main(["transform", "--scale", "2.0", "--out-dir", out,
                     CYL]) == 0
        doubled = _xyz(os.path.join(out, "cylinder_small_tf.pcd"))
        np.testing.assert_allclose(doubled, 2.0 * _xyz(CYL), atol=1e-5)

    def test_euler_order_matches_pcl(self):
        # pcl::getTransformation applies R = Rz(yaw)·Ry(pitch)·Rx(roll)
        R = _euler_matrix(0.1, 0.2, 0.3)
        ex = np.array([1.0, 0, 0])
        # yaw rotates x toward y after pitch tips it down
        v = R @ ex
        assert v[2] == pytest.approx(-np.sin(0.2), abs=1e-12)

    def test_channels_survive(self, tmp_path):
        out = str(tmp_path)
        src = _xyz(CYL)
        main(["transform", "--x", "1.0", "--out-dir", out, CYL])
        a = load_pcd_arrays(os.path.join(out, "cylinder_small_tf.pcd"))
        orig = load_pcd_arrays(CYL)
        extra = [k for k in orig if k not in ("x", "y", "z")]
        for k in extra:
            np.testing.assert_allclose(a[k], orig[k], atol=1e-5)


class TestCropDenoiseProjectConcat:
    def test_crop(self, tmp_path):
        out = str(tmp_path)
        orig = _xyz(CYL)
        zmid = float(np.median(orig[:, 2]))
        assert main(["crop", "--axis", "z", "--min", str(zmid), "--max",
                     "1e9", "--out-dir", out, CYL]) == 0
        kept = _xyz(os.path.join(out, "cylinder_small_crop_z.pcd"))
        assert 0 < len(kept) < len(orig)
        assert kept[:, 2].min() >= zmid

    def test_denoise_drops_injected_outliers(self, tmp_path):
        out = str(tmp_path)
        from mapping_private_tpu.io.pcd import save_pcd

        orig = _xyz(CYL).astype(np.float32)
        noisy = np.vstack([orig, orig.mean(0) + np.float32([5, 5, 5]),
                           orig.mean(0) - np.float32([7, 3, 9])])
        noisy_p = str(tmp_path / "noisy.pcd")
        save_pcd(noisy_p, {"xyz": noisy})
        assert main(["denoise", "--mean-k", "10", "--std-mul", "1.0",
                     "--out-dir", out, noisy_p]) == 0
        clean = _xyz(os.path.join(out, "noisy_denoised.pcd"))
        assert len(clean) < len(noisy)
        assert np.abs(clean - orig.mean(0)).max() < 1.0  # outliers gone

    def test_project(self, tmp_path):
        out = str(tmp_path)
        assert main(["project", "--out-dir", out, CYL]) == 0
        proj = _xyz(os.path.join(out, "cylinder_small_proj.pcd"))
        assert np.all(proj[:, 2] == 0.0)
        np.testing.assert_allclose(proj[:, :2], _xyz(CYL)[:, :2], atol=1e-5)

    def test_concat(self, tmp_path):
        dst = str(tmp_path / "merged.pcd")
        assert main(["concat", "--out", dst, CYL, CYL]) == 0
        merged = _xyz(dst)
        assert len(merged) == 2 * len(_xyz(CYL))

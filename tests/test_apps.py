"""End-to-end app tests on REAL reference data (the reference's own
accuracy-harness strategy, SURVEY §4.3)."""
import glob
import json
import os

import numpy as np
import pytest

DATA = "/root/reference/color_feature_classification/demos/data"
SHAPE = "/root/reference/color_chlac/demos/shape_data"


class TestClassifyHarness:
    @pytest.mark.corpus
    def test_rate_on_corpus_subset(self):
        """Subspace classification over 6 real objects × 6 views each must
        reach a high resubstitution rate (the reference's calcRate flow)."""
        from mapping_private_tpu.apps.classify import classification_rate

        objs = ["obj000", "obj001", "obj002", "obj010", "obj020", "obj030"]
        rate, per_obj = classification_rate(
            DATA, feature_type="d", dim_subspace=4,
            objects=objs, max_views=6,
        )
        assert len(per_obj) == 6
        assert rate > 0.85, f"classification rate too low: {rate}"

    @pytest.mark.corpus
    def test_cli_json(self, capsys):
        from mapping_private_tpu.apps.classify import main

        rc = main([
            "rate", "--data-dir", DATA, "--objects", "obj000", "obj001",
            "--max-views", "3", "--json",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert 0.0 <= out["rate"] <= 1.0


class TestDetectObjectApp:
    def test_learn_and_detect_roundtrip(self, tmp_path):
        from mapping_private_tpu.apps.detect_object import (
            learn_object, detect,
        )

        # learn the red noisy sphere; detect it in its own scene
        train = sorted(glob.glob(f"{SHAPE}/noisy_sphere_*.pcd"))
        train = [p for p in train if "GRSD" not in p][:3]
        obj_pca = str(tmp_path / "obj.pca")
        learn_object(train, obj_pca, dim_model=2)
        dets = detect(train[0], obj_pca, ranges=(3, 3, 3), block_size=4,
                      dim=0, dim_model=2, exist_threshold=5.0)
        assert dets and dets[0]["score"] > 0.8


class TestICPRegisterApp:
    def test_two_scans(self, tmp_path, capsys):
        from mapping_private_tpu.io.pcd import load_pcd_arrays, save_pcd
        from mapping_private_tpu.apps.icp_register import main

        src = "/root/reference/cloud_algos/data/cylinder_small.pcd"
        d = load_pcd_arrays(src)
        xyz = np.column_stack([d["x"], d["y"], d["z"]]).astype(np.float32)
        a = str(tmp_path / "a.pcd")
        b = str(tmp_path / "b.pcd")
        save_pcd(a, {"xyz": xyz})
        save_pcd(b, {"xyz": xyz + np.array([0.004, -0.003, 0.002], np.float32)})
        rc = main([a, b, "--json", "--max-corr-dist", "0.05"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        T = np.asarray(out["pairwise"][0])
        # recovered translation ≈ the planted shift (sign: src→tgt)
        np.testing.assert_allclose(
            np.abs(T[:3, 3]), [0.004, 0.003, 0.002], atol=0.002
        )


class TestHoughApp:
    def test_cli_on_synthetic(self, tmp_path, capsys):
        from mapping_private_tpu.io.pcd import save_pcd
        from mapping_private_tpu.apps.hough_segment import main

        rng = np.random.default_rng(0)
        ang = rng.uniform(0, 2 * np.pi, 500)
        z = rng.uniform(0, 0.3, 500)
        pts = np.column_stack([
            0.4 + 0.05 * np.cos(ang), 0.3 + 0.05 * np.sin(ang), z
        ]).astype(np.float32)
        p = str(tmp_path / "scene.pcd")
        save_pcd(p, {"xyz": pts})
        out_dir = str(tmp_path / "segs")
        rc = main([p, "--json", "--min-inliers", "100", "--out-dir", out_dir])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        segs = out[p]
        assert segs and segs[0]["kind"] == "cylinder"
        assert abs(segs[0]["cylinder"]["radius"] - 0.05) < 0.01
        assert glob.glob(os.path.join(out_dir, "object-*.pcd"))


class TestCleanTableApp:
    def test_plan(self, tmp_path):
        from mapping_private_tpu.io.pcd import save_pcd
        from mapping_private_tpu.apps.clean_table import plan_clean_table

        rng = np.random.default_rng(0)
        t = rng.uniform([-0.5, -0.4], [0.5, 0.4], (1200, 2))
        table = np.column_stack([t, np.full(len(t), 0.75)])
        obj = rng.uniform([0.08, -0.02, 0.76], [0.2, 0.1, 0.97], (800, 3))
        rest = rng.uniform([-2, -2, 0], [2, 2, 2], (500, 3))
        pts = np.vstack([table, obj, rest]).astype(np.float32)
        p = str(tmp_path / "scene.pcd")
        save_pcd(p, {"xyz": pts})
        plan = plan_clean_table(p)
        assert plan["table_found"]
        assert plan["grasps"], "no grasps planned"
        g = plan["grasps"][0]
        # grasp hovers over the object cluster
        assert 0.05 < g["position"][0] < 0.25
        assert g["pregrasp"][2] > g["position"][2]
        assert g["width"] < 0.2

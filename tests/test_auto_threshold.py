"""RGB auto-threshold learning parity (round-4 verdict item 5).

The reference's calc_scene_auto_threshold.cpp is PCL I/O around a pure-C
between-class-variance solver (lines 115-152).  The solver lines are
EXTRACTED from the reference source at test time and compiled into a
driver that reads a histogram — so our vectorized implementation is
gated against the reference's actual loop, not a transliteration of it
(same pattern as the libsvm / HLAC.hpp oracles).  A golden-corpus run
then drives the full path (PCD -> voxel grid -> histograms -> threshold)
through apps.detect_object.learn_threshold.
"""
import glob
import os
import subprocess

import numpy as np
import pytest

REF_CPP = ("/root/reference/color_voxel_recognition/test/"
           "calc_scene_auto_threshold.cpp")
SHAPE_DATA = "/root/reference/color_chlac/demos/shape_data"


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """Compile the reference's own solver block (totalAve / eachAve /
    threshold loops) into a stdin-histogram driver."""
    with open(REF_CPP) as f:
        src = f.read()
    start = src.index("//* total average of RGB values")
    end = src.index('printf("totalAverage')
    solver = src[start:end]
    assert "max_var" in solver and "eachNum" in solver
    tmp = tmp_path_factory.mktemp("thr_oracle")
    driver = tmp / "driver.c"
    driver.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "int main(void) {\n"
        "  int totalNum = 0;\n"
        "  int threshold[3] = {0, 0, 0};\n"
        "  double totalAve[3] = {0, 0, 0};\n"
        "  static double eachAve[3][256];\n"
        "  static int eachNum[3][256];\n"
        "  static int h[3][256];\n"
        "  for (int i = 0; i < 3; i++)\n"
        "    for (int j = 0; j < 256; j++)\n"
        "      if (scanf(\"%d\", &h[i][j]) != 1) return 1;\n"
        "  for (int j = 0; j < 256; j++) totalNum += h[0][j];\n"
        + solver +
        "  printf(\"%d %d %d\\n\", threshold[0], threshold[1], "
        "threshold[2]);\n  return 0;\n}\n")
    exe = str(tmp / "thr_oracle")
    r = subprocess.run(["gcc", "-O2", "-w", str(driver), "-o", exe],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:200]}")
    return exe


def run_oracle(exe, hist):
    inp = " ".join(str(int(v)) for v in np.asarray(hist).reshape(-1))
    r = subprocess.run([exe], input=inp, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return tuple(int(v) for v in r.stdout.split())


class TestSolverParity:
    def test_random_histograms(self, oracle):
        from mapping_private_tpu.features import calc_auto_threshold

        rng = np.random.default_rng(0)
        for trial in range(40):
            kind = trial % 4
            h = np.zeros((3, 256), np.int64)
            if kind == 0:  # dense random
                h = rng.integers(0, 50, (3, 256))
            elif kind == 1:  # sparse spikes
                for c in range(3):
                    pos = rng.choice(256, rng.integers(1, 6), replace=False)
                    h[c, pos] = rng.integers(1, 1000, len(pos))
            elif kind == 2:  # bimodal
                for c in range(3):
                    a, b = sorted(rng.choice(256, 2, replace=False))
                    h[c, a], h[c, b] = rng.integers(1, 500, 2)
            else:  # single bin (degenerate: no split improves on 0)
                for c in range(3):
                    h[c, rng.integers(0, 256)] = rng.integers(1, 100)
            # all channels share totalNum in the reference: equalize masses
            m = h.sum(1).max()
            for c in range(3):
                d = m - h[c].sum()
                h[c, 0] += d
            assert calc_auto_threshold(h) == run_oracle(oracle, h), (
                f"trial {trial} kind {kind}")

    def test_edge_bins(self, oracle):
        from mapping_private_tpu.features import calc_auto_threshold

        for h0 in ([1000] + [0] * 255,            # all mass at 0
                   [0] * 255 + [1000],            # all mass at 255
                   [500] + [0] * 254 + [500]):    # extremes
            h = np.tile(np.asarray(h0, np.int64), (3, 1))
            assert calc_auto_threshold(h) == run_oracle(oracle, h)


class TestGoldenCorpus:
    def test_learn_threshold_on_shape_data(self, oracle, tmp_path):
        """Full path on real reference PCDs: thresholds from the voxel
        histograms must equal the reference solver run on the SAME
        histograms, and the written file must round-trip."""
        import jax

        from mapping_private_tpu.apps.detect_object import (
            _grid, learn_threshold, read_color_threshold)
        from mapping_private_tpu.features import rgb_voxel_histograms
        from mapping_private_tpu.io.pcd import load_pcd

        pcds = sorted(
            p for p in glob.glob(os.path.join(SHAPE_DATA, "*.pcd"))
            if "GRSD_CCHLAC" not in p)[:4]  # xyz+rgb clouds, not features
        if not pcds:
            pytest.skip("golden corpus not present")
        out = str(tmp_path / "color_threshold.txt")
        thr = learn_threshold(pcds, out)
        assert read_color_threshold(out) == thr

        total = None
        for p in pcds:
            hst = np.asarray(rgb_voxel_histograms(_grid(load_pcd(p))[0]))
            total = hst if total is None else total + hst
        assert thr == run_oracle(oracle, total)
        # thresholds actually reflect the scene (not the hard default)
        assert all(0 <= t <= 254 for t in thr)

    def test_threshold_changes_features(self):
        """Wiring check: a learned threshold flows into the binarized
        C3-HLAC bins (the silent-default failure mode the verdict
        flagged).  Two-tone cloud: a learned split at r=80 classifies the
        dim points differently from the 127 default only if the threshold
        argument actually reaches the binarizer."""
        import jax.numpy as jnp

        from mapping_private_tpu.core.cloud import PointCloud
        from mapping_private_tpu.core.voxelgrid import voxelize
        from mapping_private_tpu.features import (
            calc_auto_threshold, colorchlac117, rgb_voxel_histograms)

        rng = np.random.default_rng(1)
        n = 256
        xyz = rng.uniform(0, 0.1, (n, 3)).astype(np.float32)
        r = np.where(np.arange(n) < n // 2, 100.0, 60.0).astype(np.float32)
        cloud = PointCloud(
            xyz=jnp.asarray(xyz), mask=jnp.ones(n, bool),
            channels={"r": jnp.asarray(r),
                      "g": jnp.zeros(n, jnp.float32),
                      "b": jnp.zeros(n, jnp.float32)})
        grid = voxelize(cloud, 0.01, jnp.zeros(3, jnp.float32), (10, 10, 10),
                        channels=("r", "g", "b"))
        thr = calc_auto_threshold(np.asarray(rgb_voxel_histograms(grid)))
        assert 60 <= thr[0] < 100  # the learned split separates the tones
        f_def = np.asarray(colorchlac117(grid))  # default 127: all dim
        f_thr = np.asarray(colorchlac117(grid, thresholds=thr))
        assert f_def.shape == f_thr.shape == (117,)
        assert not np.allclose(f_def, f_thr)


class TestResidueUtilities:
    """The last #16 utilities: variance_show and save_data's depth limit."""

    def test_variance_report(self, tmp_path):
        import jax.numpy as jnp

        from mapping_private_tpu.recognition import (
            pca_fit, read_pca, variance_report, write_pca)

        rng = np.random.default_rng(2)
        X = rng.normal(size=(40, 8)) * np.array([8, 4, 2, 1, .5, .25, .1, .05])
        pca = pca_fit(jnp.asarray(X))
        v = variance_report(pca)
        assert len(v) == 8 and (np.diff(v) <= 1e-9).all()  # descending
        # -d: accumulative contribution rate is monotone, full = 1
        r2 = variance_report(pca, contrib_dim=2)
        r8 = variance_report(pca, contrib_dim=8)
        assert 0 < r2 < r8 and abs(r8 - 1.0) < 1e-12
        # -c: first index reaching the rate; unreachable rate -> dim
        idx = variance_report(pca, contrib_rate=r2)
        assert idx == 1  # 0-based index where cumsum/total >= rate(2 dims)
        assert variance_report(pca, contrib_rate=1.5) == 8
        # file round-trip matches (variance_show reads pca_result files)
        f = str(tmp_path / "pca_result")
        write_pca(f, pca)
        assert np.allclose(variance_report(read_pca(f)), v, atol=1e-5)

    def test_depth_limit_mask(self):
        import jax.numpy as jnp

        from mapping_private_tpu.ops.filters import depth_limit_mask

        z = np.array([0.5, 1.0, 2.0, 6.0, 3.0], np.float32)
        xyz = np.stack([np.zeros(5), np.zeros(5), z], 1).astype(np.float32)
        mask = np.array([True, True, True, True, False])
        # absolute: z < 5.0 (save_data.cpp default DISTANCE_TH path)
        m = np.asarray(depth_limit_mask(jnp.asarray(xyz), jnp.asarray(mask), 5.0))
        assert m.tolist() == [True, True, True, False, False]
        # relative: z < min_live_z + 1.0 = 1.5; dead rows never revive
        m = np.asarray(depth_limit_mask(
            jnp.asarray(xyz), jnp.asarray(mask), 1.0, relative=True))
        assert m.tolist() == [True, True, False, False, False]

    def test_triggered_capture_depth_limit(self, tmp_path):
        from mapping_private_tpu.io.pcd import load_pcd_arrays
        from mapping_private_tpu.pipeline.acquisition import TriggeredCapture

        cap = TriggeredCapture(str(tmp_path), distance_th=1.0, relative=True)
        z = np.array([0.4, 0.6, 3.0], np.float32)
        xyz = np.stack([np.zeros(3), np.zeros(3), z], 1).astype(np.float32)
        cap.push({"xyz": xyz})
        path = cap.trigger()
        got = load_pcd_arrays(path)
        assert len(got["z"]) == 2 and got["z"].max() < 1.4
        lo, hi = cap.last_bbox
        assert hi[2] == np.float32(0.6)

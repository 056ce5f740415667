"""Hough evaluation harness (models/hough_eval.py — the
analyze_sequential_hough + assemble_statistics_file counterpart):
matching semantics, statistics assembly, and gates on the committed
HOUGH_EVAL.json rates."""
import json
import os

import numpy as np
import jax
import pytest

from mapping_private_tpu.models.hough_eval import (
    GroundTruthObject,
    MatchResult,
    aggregate,
    evaluate_scene,
    match_scene,
    repeatability,
    segment_centroid,
    to_markdown,
)
from mapping_private_tpu.models.hough_segmentation import HoughSegment
from mapping_private_tpu.fit.box import OrientedBox

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cyl_seg(cx, cy, r=0.04, zmin=0.0, zmax=0.3, size="medium", n=100):
    return HoughSegment(
        kind="cylinder", size_class=size, inliers=np.zeros(8, bool),
        num_inliers=n, cylinder=(np.array([cx, cy]), r, zmin, zmax))


def _box_seg(cx, cy, cz, ext=(0.2, 0.12, 0.18), size="short", n=100):
    return HoughSegment(
        kind="cuboid", size_class=size, inliers=np.zeros(8, bool),
        num_inliers=n,
        box=OrientedBox(center=np.array([cx, cy, cz]),
                        axes=np.eye(3), extents=np.asarray(ext)))


def _gt_cyl(name, cx, cy, cz, r=0.04, size="medium"):
    return GroundTruthObject(
        name=name, kind="cylinder", centroid=np.array([cx, cy, cz]),
        size_class=size, radius=r)


class TestMatching:
    def test_exact_match(self):
        segs = [_cyl_seg(0.8, 0.5, zmin=0.0, zmax=0.3)]
        gts = [_gt_cyl("a", 0.8, 0.5, 0.15)]
        res, fp = match_scene(segs, gts)
        assert res[0].segment is segs[0]
        assert res[0].kind_correct and res[0].size_class_correct
        assert res[0].centroid_error < 1e-9
        assert res[0].dimension_error < 1e-9
        assert fp == []

    def test_beyond_threshold_is_missed(self):
        segs = [_cyl_seg(1.5, 0.5)]
        gts = [_gt_cyl("a", 0.8, 0.5, 0.15)]
        res, fp = match_scene(segs, gts)
        assert res[0].segment is None
        assert len(fp) == 1  # the stray segment is a false positive

    def test_greedy_takes_nearest(self):
        # two GT objects, one segment between them but closer to b —
        # b must claim it, a is missed
        segs = [_cyl_seg(0.86, 0.5, zmin=0.0, zmax=0.3)]
        gts = [_gt_cyl("a", 0.80, 0.5, 0.15), _gt_cyl("b", 0.88, 0.5, 0.15)]
        res, _ = match_scene(segs, gts)
        by_name = {r.gt.name: r for r in res}
        assert by_name["b"].segment is segs[0]
        assert by_name["a"].segment is None

    def test_segment_claimed_once(self):
        segs = [_cyl_seg(0.8, 0.5, zmin=0.0, zmax=0.3),
                _cyl_seg(0.82, 0.5, zmin=0.0, zmax=0.3)]
        gts = [_gt_cyl("a", 0.8, 0.5, 0.15), _gt_cyl("b", 0.82, 0.5, 0.15)]
        res, fp = match_scene(segs, gts)
        assert {id(r.segment) for r in res} == {id(segs[0]), id(segs[1])}
        assert fp == []

    def test_kind_confusion_recorded(self):
        # a cuboid GT matched by a cylinder segment: detected but
        # kind-incorrect
        segs = [_cyl_seg(0.3, 0.2, zmin=0.0, zmax=0.18, size="short")]
        gts = [GroundTruthObject(
            name="box", kind="cuboid", centroid=np.array([0.3, 0.2, 0.09]),
            size_class="short", extents=np.array([0.2, 0.12, 0.18]))]
        res, _ = match_scene(segs, gts)
        assert res[0].segment is not None
        assert not res[0].kind_correct

    def test_rest_points_box_counts_for_cuboid(self):
        seg = _box_seg(0.3, 0.2, 0.09)
        seg = HoughSegment(
            kind="box", size_class="short", inliers=np.zeros(8, bool),
            num_inliers=50, box=seg.box)
        gts = [GroundTruthObject(
            name="box", kind="cuboid", centroid=np.array([0.3, 0.2, 0.09]),
            size_class="short", extents=np.array([0.2, 0.12, 0.18]))]
        res, _ = match_scene([seg], gts)
        assert res[0].kind_correct

    def test_centroids(self):
        assert np.allclose(
            segment_centroid(_cyl_seg(1, 2, zmin=0.0, zmax=0.4)),
            [1, 2, 0.2])
        assert np.allclose(
            segment_centroid(_box_seg(1, 2, 3)), [1, 2, 3])


class TestStatistics:
    def _stats(self):
        segs = [_cyl_seg(0.8, 0.5, zmin=0, zmax=0.3),
                _box_seg(0.3, 0.2, 0.09),
                _cyl_seg(5.0, 5.0)]  # false positive
        gts = [
            _gt_cyl("cyl", 0.8, 0.5, 0.15),
            GroundTruthObject(
                name="box", kind="cuboid",
                centroid=np.array([0.3, 0.2, 0.09]), size_class="short",
                extents=np.array([0.2, 0.12, 0.18])),
            _gt_cyl("missed", 9.0, 9.0, 0.15),
        ]
        return evaluate_scene("s", segs, gts)

    def test_scene_stats(self):
        s = self._stats()
        assert s.n_gt == 3 and s.n_detected == 2
        assert s.n_kind_correct == 2 and s.n_false_pos == 1
        assert s.per_object == {"cyl": True, "box": True, "missed": False}

    def test_aggregate_and_markdown(self):
        agg = aggregate([self._stats()])
        assert agg["recall"] == round(2 / 3, 4)
        assert agg["precision"] == round(2 / 3, 4)
        assert agg["size_class_accuracy"] == 1.0
        assert agg["size_class_confusion"]["medium"]["medium"] == 1
        md = to_markdown(agg, [self._stats()])
        assert "precision" in md and "| s |" in md

    def test_repeatability(self):
        gts = [_gt_cyl("a", 0.8, 0.5, 0.15)]

        def run(seed):
            return [_cyl_seg(0.8, 0.5, zmin=0, zmax=0.3)] if seed < 2 else []

        r = repeatability(run, gts, runs=3)
        assert abs(r["a"] - 2 / 3) < 1e-9


class TestEndToEndSynthetic:
    def test_synthetic_scene_rates(self):
        """The harness on a live segmentation of the synthetic tabletop
        scene: both objects detected kind-correctly, no misses."""
        from test_hough import _tabletop_scene
        from mapping_private_tpu.core import PointCloud
        from mapping_private_tpu.models.hough_segmentation import (
            HoughConfig, hough_segment)

        pts, n_wall, _ = _tabletop_scene()
        gt_cyl = _gt_cyl("cyl", 0.8, 0.5, 0.275, size="medium")
        gt_box = GroundTruthObject(
            name="box", kind="cuboid", centroid=np.array([0.4, 0.26, 0.09]),
            size_class="short", extents=np.array([0.2, 0.12, 0.18]))
        segs = hough_segment(
            PointCloud.from_numpy(pts), jax.random.PRNGKey(0),
            HoughConfig(max_objects=4, min_inliers=80))
        s = evaluate_scene("synthetic", segs, [gt_cyl, gt_box])
        assert s.n_detected == 2
        assert s.n_kind_correct == 2
        agg = aggregate([s])
        assert agg["recall"] == 1.0 and agg["kind_recall"] == 1.0
        assert agg["centroid_error_max"] < 0.05


class TestCommittedArtifact:
    def test_recorded_rates(self):
        """Gates on the committed HOUGH_EVAL.json (regenerate with
        scripts/run_hough_eval.py)."""
        path = os.path.join(ROOT, "HOUGH_EVAL.json")
        assert os.path.exists(path), "run scripts/run_hough_eval.py"
        with open(path) as f:
            ev = json.load(f)
        for method in ("sequential_hough", "segment_by_voting"):
            agg = ev[method]
            assert agg["gt_objects"] >= 12
            assert agg["recall"] >= 0.9, (method, agg)
            assert agg["kind_recall"] >= 0.8, (method, agg)
            assert agg["precision"] >= 0.55, (method, agg)
            assert agg["centroid_error_mean"] is not None
            assert agg["centroid_error_mean"] < 0.06, (method, agg)
            # repeatability: suite-wide mean is solid; individual hard
            # objects (the milk carton for sequential hough) may sit at
            # 0–1/3 — real signal the harness exists to show
            rates = [r for objs in agg["repeatability"].values()
                     for r in objs.values()]
            assert float(np.mean(rates)) >= 0.7, (method, rates)
        # round-5 recalibration targets (verdict item 3): the tuned
        # sequential_hough recipe must hold precision >= 0.8 with
        # kind_recall >= 0.9 at full recall
        sh = ev["sequential_hough"]
        assert sh["recall"] == 1.0, sh
        assert sh["kind_recall"] >= 0.9, sh
        assert sh["precision"] >= 0.8, sh


class TestRealSceneGates:
    """Round-5 recalibration: the real-scan recipe (vote-density circle
    gate + shape-aware rest pass with sliver/dedup gates) must hold the
    HOUGH_EVAL headline on the worst round-4 scene — real-three-objects
    went from 8 segments / 5 FPs / kind 2-of-3 to 3 segments / 0 FPs /
    kind 3-of-3."""

    def test_three_object_scene_clean(self):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        from run_hough_eval import build_scenes

        from mapping_private_tpu.core import PointCloud
        from mapping_private_tpu.models.hough_segmentation import (
            HoughConfig, hough_segment)

        scenes = {s: (p, g) for s, p, g in build_scenes()}
        pts, gts = scenes["real-three-objects"]
        cfg = HoughConfig(max_objects=4, min_inliers=150,
                          mls_smoothing=True, circle_vote_density_min=1.0)
        segs = hough_segment(
            PointCloud.from_numpy(pts), jax.random.PRNGKey(0), cfg)
        s = evaluate_scene("real-three-objects", segs, gts)
        assert s.n_detected == 3, s
        assert s.n_kind_correct == 3, s
        assert s.n_false_pos == 0, s
        agg = aggregate([s])
        assert agg["recall"] == 1.0 and agg["precision"] == 1.0

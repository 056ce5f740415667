"""Tests for sequential Hough-voting segmentation."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.models.hough_segmentation import (
    HoughConfig,
    _clustering_gate,
    hough_segment,
)


def _tabletop_scene(seed=0):
    """A box and a cylinder standing on z=0 (side-view points: walls only)."""
    rng = np.random.default_rng(seed)
    # cuboid: 0.2 x 0.12 footprint at (0.3, 0.2), height 0.18; sample walls
    n_wall = 700
    t = rng.uniform(0, 1, n_wall)
    side = rng.integers(0, 4, n_wall)
    x = np.where(side == 0, 0.3 + t * 0.2,
        np.where(side == 1, 0.3 + t * 0.2,
        np.where(side == 2, 0.3, 0.5)))
    y = np.where(side == 0, 0.2,
        np.where(side == 1, 0.32,
        np.where(side == 2, 0.2 + t * 0.12, 0.2 + t * 0.12)))
    zb = rng.uniform(0.0, 0.18, n_wall)
    box_pts = np.column_stack([x, y, zb])

    # cylinder: r=0.04 at (0.8, 0.5), height 0.55 (tall)
    n_cyl = 600
    ang = rng.uniform(0, 2 * np.pi, n_cyl)
    zc = rng.uniform(0.0, 0.55, n_cyl)
    cyl_pts = np.column_stack([
        0.8 + 0.04 * np.cos(ang), 0.5 + 0.04 * np.sin(ang), zc
    ])
    pts = np.vstack([box_pts, cyl_pts]).astype(np.float32)
    pts[:, :2] += rng.normal(0, 0.0015, (len(pts), 2))
    return pts, n_wall, n_cyl


class TestHoughSegmentation:
    def test_extracts_box_and_cylinder(self):
        pts, n_wall, n_cyl = _tabletop_scene()
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=4, min_inliers=80)
        segs = hough_segment(cloud, jax.random.PRNGKey(0), cfg)
        assert len(segs) >= 2
        kinds = {s.kind for s in segs[:2]}
        assert kinds == {"cuboid", "cylinder"}

        cyl = next(s for s in segs if s.kind == "cylinder")
        center, r, zmin, zmax = cyl.cylinder
        np.testing.assert_allclose(center, [0.8, 0.5], atol=0.01)
        assert abs(r - 0.04) < 0.01
        assert cyl.size_class == "medium"  # 0.55 m: > medium_value, < tall_value
        # cylinder claims mostly cylinder points
        assert cyl.inliers[n_wall:n_wall + n_cyl].mean() > 0.9
        assert cyl.inliers[:n_wall].mean() < 0.05

        cub = next(s for s in segs if s.kind == "cuboid")
        e = np.sort(np.asarray(cub.box.extents))
        np.testing.assert_allclose(e, [0.12, 0.18, 0.2], atol=0.05)
        assert cub.size_class == "short"

    def test_segments_disjoint(self):
        pts, _, _ = _tabletop_scene(1)
        cloud = PointCloud.from_numpy(pts)
        segs = hough_segment(
            cloud, jax.random.PRNGKey(1), HoughConfig(max_objects=4, min_inliers=80)
        )
        total = np.zeros(cloud.capacity, int)
        for s in segs:
            total += s.inliers.astype(int)
        assert (total <= 1).all()

    def test_empty_cloud(self):
        cloud = PointCloud.from_numpy(np.zeros((0, 3), np.float32))
        segs = hough_segment(cloud, jax.random.PRNGKey(2))
        assert segs == []


class TestHypothesisGates:
    """One candidate each gate must reject and must pass
    (ClusteringFeatureForLines/Circles, sequential_hough.cpp:662-1255)."""

    def _two_blob_candidate(self):
        """Inliers spanning two well-separated blobs: blob A rich in
        matching curvature, blob B poor — the gate must keep A only."""
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 0.05, (60, 3)).astype(np.float32)
        b = rng.uniform(0, 0.05, (40, 3)).astype(np.float32) + np.float32(1.0)
        xyz = jnp.asarray(np.vstack([a, b]))
        inl = jnp.ones((100,), bool)
        # planar curvature on blob A only
        planar = jnp.asarray(np.arange(100) < 60)
        return xyz, inl, planar

    def test_clustering_gate_keeps_best_cluster(self):
        xyz, inl, planar = self._two_blob_candidate()
        kept, n_match = _clustering_gate(xyz, inl, planar, jnp.float32(0.05), True)
        kept = np.asarray(kept)
        assert int(n_match) == 60
        assert kept[:60].all() and not kept[60:].any()

    def test_clustering_gate_rejects_no_matching_curvature(self):
        """A circle candidate whose inliers are all planar-curvature points
        has ≤1 matching (non-planar) curvature → the reference rejects it
        (maximum_size_of_curvature_clusters <= 1, sequential_hough.cpp:760-764)."""
        xyz, inl, planar = self._two_blob_candidate()
        all_planar = jnp.ones_like(planar)
        _, n_match = _clustering_gate(
            xyz, inl, all_planar, jnp.float32(0.05), False)
        assert int(n_match) <= 1  # caller rejects the candidate

    def test_gates_reject_circle_on_flat_patch(self):
        """End-to-end reject: a dense flat patch offers plenty of
        >min_inliers circle candidates (any ring through a filled planar
        region), but every point has planar curvature, so the circle
        clustering gate must kill them — no cylinder may be emitted."""
        rng = np.random.default_rng(4)
        pts = np.column_stack([
            rng.uniform(0, 0.3, 4000),
            rng.uniform(0, 0.3, 4000),
            np.full(4000, 0.05) + rng.normal(0, 0.0005, 4000),
        ]).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=3, min_inliers=80,
                          deal_with_the_rest_of_the_points=False)
        segs = hough_segment(cloud, jax.random.PRNGKey(5), cfg)
        assert all(s.kind != "cylinder" for s in segs)

    def test_gates_pass_good_candidates(self):
        """End-to-end accept under the default (gates-on) config: the main
        scene's cuboid and cylinder must both survive every gate."""
        pts, _, _ = _tabletop_scene(2)
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=4, min_inliers=80)
        assert cfg.use_feature_gates  # the gates really are on by default
        segs = hough_segment(cloud, jax.random.PRNGKey(6), cfg)
        kinds = {s.kind for s in segs}
        assert "cuboid" in kinds and "cylinder" in kinds


class TestHoughRealData:
    """Sequential hough on REAL Kinect scans from the bundled corpus
    (color_feature_classification/demos/data) — the reference's own
    methodology of per-dataset recipes on real PCDs
    (hough_segmentation/readme/sequential_hough; the recipes' scene files
    are not in the snapshot, so scenes are composed from the corpus'
    real object views placed on a common table plane)."""

    DATA = "/root/reference/color_feature_classification/demos/data"

    def _zup(self, path):
        """Camera-frame Kinect view (y down, z forward) → table frame
        (z up), resting on z=0."""
        from mapping_private_tpu.io import load_pcd_arrays

        a = load_pcd_arrays(path)
        xyz = np.stack([a["x"], a["z"], -a["y"]], 1).astype(np.float32)
        return xyz - xyz.min(0)

    def test_two_real_cylinders(self):
        """A real soup can + a real plastic cup, set apart on a table:
        each must be extracted as its own cylinder with a plausible
        radius, with no cross-object point stealing."""
        can = self._zup(f"{self.DATA}/obj008/tomato-soup_0000.pcd")
        cup = self._zup(f"{self.DATA}/obj026/plastic_cup2_0000.pcd")
        cup[:, 0] += 0.35
        pts = np.vstack([can, cup])
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=4, min_inliers=150, mls_smoothing=True)
        segs = hough_segment(cloud, jax.random.PRNGKey(0), cfg)
        cyls = [s for s in segs if s.kind == "cylinder"]
        assert len(cyls) >= 2
        # match each object to the cylinder that claims it
        n_can = len(can)
        got_can = got_cup = False
        for s in cyls:
            in_can = int(s.inliers[:n_can].sum())
            in_cup = int(s.inliers[n_can:].sum())
            purity = max(in_can, in_cup) / max(in_can + in_cup, 1)
            assert purity > 0.95, "cylinder mixes the two objects"
            _, r, _, _ = s.cylinder
            if in_can > in_cup and in_can > 2000:
                got_can = True
                assert 0.02 < r < 0.05  # soup can radius ≈ 0.035
            if in_cup > in_can and in_cup > 1500:
                got_cup = True
                assert 0.02 < r < 0.06
        assert got_can and got_cup

    def test_real_can_not_stolen_by_box_object(self):
        """Soup can + milk carton: whatever the carton segments into, the
        can must come out as a clean cylinder of its own points."""
        can = self._zup(f"{self.DATA}/obj008/tomato-soup_0000.pcd")
        carton = self._zup(f"{self.DATA}/obj020/hvoll_milch_ap_0000.pcd")
        carton[:, 0] += 0.35
        pts = np.vstack([can, carton])
        cloud = PointCloud.from_numpy(pts)
        cfg = HoughConfig(max_objects=4, min_inliers=150, mls_smoothing=True)
        segs = hough_segment(cloud, jax.random.PRNGKey(0), cfg)
        n_can = len(can)
        can_cyls = [
            s for s in segs if s.kind == "cylinder"
            and int(s.inliers[:n_can].sum()) > 2000
        ]
        assert len(can_cyls) == 1
        s = can_cyls[0]
        assert int(s.inliers[n_can:].sum()) == 0  # no carton points
        assert 0.02 < s.cylinder[1] < 0.05


def test_hough_mark_classes():
    """hough_classification's marked-cloud output: flat→3, box→2,
    cylinder→4, unclaimed→0 (hough_classification.cpp:4294-4599)."""
    from mapping_private_tpu.models.hough_segmentation import (
        hough_mark_classes,
    )

    pts, _, _ = _tabletop_scene(2)
    cloud = PointCloud.from_numpy(pts)
    segs = hough_segment(cloud, jax.random.PRNGKey(6),
                         HoughConfig(max_objects=4, min_inliers=80))
    marks = hough_mark_classes(cloud, segs)
    assert marks.shape == (cloud.capacity,)
    got = set(np.unique(marks).tolist())
    assert 4 in got          # the cylinder
    assert got & {2, 3}      # at least one box class
    for s in segs:
        if s.kind == "cylinder":
            assert (marks[s.inliers] == 4).all()


class TestSegmentByVoting:
    """Cluster-first per-object voting (segmentation_by_voting.cpp)."""

    def test_cylinder_and_boxes(self):
        from mapping_private_tpu.models.hough_segmentation import (
            VotingConfig, cylinder_sizes_text, segment_by_voting,
        )

        pts, n_wall, n_cyl = _tabletop_scene()
        cloud = PointCloud.from_numpy(pts)
        segs, sizes = segment_by_voting(cloud, jax.random.PRNGKey(0))
        assert len(segs) >= 2

        cyls = [s for s in segs if s.kind == "cylinder"]
        assert len(cyls) == 1
        s = cyls[0]
        center, r, zmin, zmax = s.cylinder
        np.testing.assert_allclose(center, [0.8, 0.5], atol=0.01)
        assert abs(r - 0.04) < 0.01
        # the whole object cluster is claimed, and it is pure cylinder points
        assert s.inliers[:n_wall].sum() == 0
        assert s.num_inliers > 300

        # box clusters never classify as cylinders
        for other in segs:
            if other is not s:
                assert other.kind in ("cuboid", "box")
                assert other.inliers[n_wall:].sum() == 0

        # sizes table carries the cylinder row (the reference's
        # cylinder-sizes-hough-ransac.txt)
        cyl_rows = [row for row in sizes if row["kind"] == "cylinder"]
        assert len(cyl_rows) == 1
        assert abs(cyl_rows[0]["radius"] - 0.04) < 0.01
        txt = cylinder_sizes_text(sizes)
        assert "cylinder radius" in txt

    def test_circles_only_variant(self):
        """using_circles_for_segmentation_by_voting: lines disabled —
        box clusters must come out as unmodeled 'box' objects."""
        from mapping_private_tpu.models.hough_segmentation import (
            VotingConfig, segment_by_voting,
        )

        pts, n_wall, _ = _tabletop_scene(1)
        cloud = PointCloud.from_numpy(pts)
        cfg = VotingConfig(allow_lines=False)
        segs, _ = segment_by_voting(cloud, jax.random.PRNGKey(1), cfg)
        kinds = {s.kind for s in segs}
        assert "cylinder" in kinds
        assert "cuboid" not in kinds

    def test_real_can_by_voting(self):
        """Real Kinect soup can through segment_by_voting at reference
        defaults (all five gates on): the object cluster must classify as
        one cylinder (segmentation_by_voting.cpp's executed gate chain —
        curvature/rsd prune inliers, percentage compares survivors)."""
        from mapping_private_tpu.models.hough_segmentation import (
            VotingConfig, segment_by_voting,
        )

        DATA = "/root/reference/color_feature_classification/demos/data"
        from mapping_private_tpu.io import load_pcd_arrays

        a = load_pcd_arrays(f"{DATA}/obj008/tomato-soup_0000.pcd")
        xyz = np.stack([a["x"], a["z"], -a["y"]], 1).astype(np.float32)
        xyz -= xyz.min(0)
        cloud = PointCloud.from_numpy(xyz)
        cfg = VotingConfig(minimum_size_of_objects_clusters=200)
        segs, sizes = segment_by_voting(cloud, jax.random.PRNGKey(0), cfg)
        cyls = [s for s in segs if s.kind == "cylinder"]
        assert len(cyls) == 1
        assert cyls[0].num_inliers > 2000
        assert 0.015 < cyls[0].cylinder[1] < 0.05
        assert any(row["kind"] == "cylinder" for row in sizes)

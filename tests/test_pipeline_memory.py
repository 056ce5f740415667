"""Tests for the pipeline DAG runner, config system, and TableMemory."""
import numpy as np
import pytest

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.ops.hull import (
    convex_polygon_intersection,
    polygon_area,
)
from mapping_private_tpu.pipeline import (
    Pipeline,
    Stage,
    config_from_dict,
    load_param_txt,
    registered_ops,
)
from mapping_private_tpu.models.table_memory import TableMemory, tables_match


def _cylinder_points(n=400, r=0.04, h=0.15, center=(0.3, 0.2), seed=0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(0, h, n)
    return np.column_stack([
        center[0] + r * np.cos(ang), center[1] + r * np.sin(ang), z
    ]).astype(np.float32)


def _box_points(n=400, ext=(0.1, 0.06, 0.12), center=(0.6, 0.4), seed=1):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)) * ext
    # push to the surface of the box (walls) for realism
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-0.5, 0.5], n)
    pts[np.arange(n), ax] = sign * np.asarray(ext)[ax]
    pts[:, 0] += center[0]; pts[:, 1] += center[1]; pts[:, 2] += ext[2] / 2
    return pts.astype(np.float32)


class TestPolygonIntersection:
    def test_overlapping_squares(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        b = a + [0.5, 0.5]
        clip = convex_polygon_intersection(a, b)
        assert abs(polygon_area(clip) - 0.25) < 1e-9

    def test_disjoint(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        b = a + [5, 5]
        assert len(convex_polygon_intersection(a, b)) == 0

    def test_contained(self):
        a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
        b = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]], float)
        clip = convex_polygon_intersection(a, b)
        assert abs(polygon_area(clip) - 1.0) < 1e-9


class TestPipeline:
    def test_builtin_registry(self):
        ops = registered_ops()
        for expected in ("MovingLeastSquares", "CylinderEstimation",
                         "RobustBoxEstimation", "RotationalEstimation",
                         "StatisticalNoiseRemoval", "NormalEstimation"):
            assert expected in ops

    def test_reconstruction_chain(self):
        """The reconstruction_pipeline.yaml chain: MLS → normals → cylinder."""
        pipe = Pipeline([
            Stage(op="StatisticalNoiseRemoval", input="table_clusters",
                  outputs={"cloud": "denoised"}, params={"k": 10, "alpha": 2.0}),
            Stage(op="MovingLeastSquares", input="denoised",
                  outputs={"cluster": "table_clusters_smooth"},
                  params={"search_radius": 0.02, "k": 16}),
            Stage(op="NormalEstimation", input="table_clusters_smooth",
                  outputs={"cloud": "with_normals"}, params={"k": 12}),
            Stage(op="CylinderEstimation", input="with_normals",
                  outputs={"model": "cyl", "inliers": "topic2"}),
        ])
        cloud = PointCloud.from_numpy(_cylinder_points())
        out = pipe.run({"table_clusters": cloud})
        assert abs(float(out["cyl"].radius) - 0.04) < 0.01
        assert int(out["topic2"].count()) > 300

    def test_requires_contract_enforced(self):
        pipe = Pipeline([
            Stage(op="CylinderEstimation", input="in", outputs={"model": "m"}),
        ])
        cloud = PointCloud.from_numpy(_cylinder_points())  # no normals
        with pytest.raises(ValueError, match="required"):
            pipe.run({"in": cloud})

    def test_missing_topic_detected(self):
        pipe = Pipeline([
            Stage(op="MovingLeastSquares", input="nope", outputs={"cluster": "x"}),
        ])
        with pytest.raises(ValueError, match="never produced"):
            pipe.run({"in": None})

    def test_yaml_roundtrip(self, tmp_path):
        y = tmp_path / "pipe.yaml"
        y.write_text(
            "MovingLeastSquares:\n"
            "  class_name: MovingLeastSquares\n"
            "  input_topic_name: {name: table_clusters, subscribe: true}\n"
            "  output_topics:\n"
            "    cluster: {name: smooth, publish: false}\n"
        )
        pipe = Pipeline.from_yaml(str(y))
        assert pipe.stages[0].op == "MovingLeastSquares"
        out = pipe.run({"table_clusters": PointCloud.from_numpy(_cylinder_points())})
        assert "smooth" in out


class TestConfig:
    def test_from_dict_typed(self):
        import dataclasses

        @dataclasses.dataclass(frozen=True)
        class C:
            a: int = 1
            b: float = 2.0
            c: bool = False

        c = config_from_dict(C, {"a": "5", "b": "0.5", "c": "true"})
        assert c == C(5, 0.5, True)
        with pytest.raises(KeyError):
            config_from_dict(C, {"nope": 1})

    def test_param_txt(self, tmp_path):
        p = tmp_path / "parameters.txt"
        p.write_text("voxel_size: 0.02\ndim: 100\n# comment\nbox_size(scene): 10\n")
        d = load_param_txt(str(p))
        assert d == {"voxel_size": "0.02", "dim": "100", "box_size(scene)": "10"}


class TestTableMemory:
    def _hull(self, cx, cy, w=0.8, h=0.6):
        return np.array([[cx - w/2, cy - h/2], [cx + w/2, cy - h/2],
                         [cx + w/2, cy + h/2], [cx - w/2, cy + h/2]])

    def test_table_matching_and_history(self):
        mem = TableMemory()
        t0 = mem.update(self._hull(1.0, 2.0), 0.75,
                        [_cylinder_points()], stamp=1.0)
        # same table seen again, slightly shifted → must merge
        t1 = mem.update(self._hull(1.05, 2.02), 0.75,
                        [_cylinder_points(seed=3), _box_points()], stamp=2.0)
        assert t0 == t1 == 0
        assert len(mem.tables) == 1
        assert len(mem.tables[0].instances) == 2
        # a different table far away → new entry
        t2 = mem.update(self._hull(5.0, 5.0), 0.9, [], stamp=3.0)
        assert t2 == 1 and len(mem.tables) == 2

    def test_reconstruction_types(self):
        mem = TableMemory()
        mem.update(self._hull(0, 0), 0.7,
                   [_cylinder_points(), _box_points()], stamp=0.0)
        objs = mem.tables[0].latest().objects
        types = sorted(o.object_type for o in objs)
        assert types == ["box", "cylinder"]
        cyl = next(o for o in objs if o.object_type == "cylinder")
        assert abs(cyl.cylinder["radius"] - 0.04) < 0.01

    def test_object_naming_persistence(self):
        mem = TableMemory()
        mem.update(self._hull(0, 0), 0.7, [_cylinder_points()], stamp=0.0)
        name0 = mem.tables[0].latest().objects[0].name
        # same object observed again (same place) keeps its name
        mem.update(self._hull(0, 0), 0.7, [_cylinder_points(seed=7)], stamp=1.0)
        assert mem.tables[0].latest().objects[0].name == name0
        # an object somewhere else gets a new name
        mem.update(self._hull(0, 0), 0.7,
                   [_cylinder_points(center=(0.9, 0.9), seed=8)], stamp=2.0)
        assert mem.tables[0].latest().objects[0].name != name0

    def test_checkpoint_restore(self, tmp_path):
        mem = TableMemory()
        mem.update(self._hull(1, 2), 0.75, [_cylinder_points(), _box_points()],
                   stamp=1.5)
        path = str(tmp_path / "mem.npz")
        mem.checkpoint(path)
        back = TableMemory.restore(path)
        assert len(back.tables) == 1
        assert back.tables[0].height == 0.75
        objs = back.tables[0].latest().objects
        assert sorted(o.object_type for o in objs) == ["box", "cylinder"]
        assert back.belief_state() == mem.belief_state()
        # restored memory continues matching correctly
        tid = back.update(self._hull(1.02, 2.0), 0.75, [], stamp=2.5)
        assert tid == 0


class TestTableMemoryGRSDVariant:
    def test_classify_fn_stored_and_checkpointed(self, tmp_path):
        """The table_memory_grsd flow: clusters classified per observation."""
        def classify(points):
            # stand-in for GRSD+SVM: tall → 'bottle', flat → 'plate'
            h = points[:, 2].max() - points[:, 2].min()
            return "bottle" if h > 0.1 else "plate"

        mem = TableMemory(classify_fn=classify)
        hull = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        mem.update(hull, 0.7, [_cylinder_points(h=0.15),
                               _cylinder_points(h=0.02, center=(0.7, 0.6))],
                   stamp=0.0)
        classes = sorted(o.semantic_class
                         for o in mem.tables[0].latest().objects)
        assert classes == ["bottle", "plate"]
        bs = mem.belief_state()
        assert {o["semantic_class"] for o in bs["table_0"]} == {"bottle", "plate"}
        path = str(tmp_path / "m.npz")
        mem.checkpoint(path)
        back = TableMemory.restore(path)
        assert {o.semantic_class for o in back.tables[0].latest().objects} \
            == {"bottle", "plate"}


class TestJittedPipeline:
    def test_whole_chain_compiles(self):
        import jax

        pipe = Pipeline([
            Stage(op="MovingLeastSquares", input="in",
                  outputs={"cluster": "smooth"},
                  params={"search_radius": 0.02, "k": 16}),
            Stage(op="NormalEstimation", input="smooth",
                  outputs={"cloud": "with_normals"}, params={"k": 12}),
            Stage(op="CylinderEstimation", input="with_normals",
                  outputs={"model": "cyl", "inliers": "inl"}),
        ])
        fn = pipe.jitted()
        cloud = PointCloud.from_numpy(_cylinder_points())
        out = fn({"in": cloud})
        assert abs(float(out["cyl"].radius) - 0.04) < 0.01
        # second call hits the compile cache (same shapes)
        out2 = fn({"in": cloud})
        assert abs(float(out2["cyl"].radius) - 0.04) < 0.01

    def test_non_jittable_rejected(self):
        pipe = Pipeline([
            Stage(op="DepthImageTriangulation", input="in",
                  outputs={"mesh": "m"}),
        ])
        with pytest.raises(ValueError, match="not jittable"):
            pipe.jitted()

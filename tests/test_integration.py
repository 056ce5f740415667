"""Tests for acquisition sync, jlo registry, COP bridge, shopping demo."""
import numpy as np
import pytest

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.integration import (
    CopBridge,
    JloRegistry,
    ServiceRegistry,
    cluster_objects_on_racks,
    infer_object_location,
)
from mapping_private_tpu.pipeline.acquisition import (
    ApproximateTimeSync,
    ScanSession,
    SweepConfig,
)


class TestApproximateTimeSync:
    def test_matches_within_slop(self):
        sync = ApproximateTimeSync(2, slop=0.05)
        sync.push(0, 1.00, "cloud_a")
        sync.push(1, 1.02, "angle_a")
        assert sync.matched == [("cloud_a", "angle_a")]

    def test_rejects_outside_slop(self):
        sync = ApproximateTimeSync(2, slop=0.05)
        sync.push(0, 1.0, "cloud")
        sync.push(1, 2.0, "angle")
        assert sync.matched == []
        sync.push(0, 2.01, "cloud2")
        assert sync.matched == [("cloud2", "angle")]

    def test_callback(self):
        got = []
        sync = ApproximateTimeSync(2, slop=0.1, callback=lambda a, b: got.append((a, b)))
        sync.push(0, 0.0, 1)
        sync.push(1, 0.01, 2)
        assert got == [(1, 2)]


class TestScanSession:
    def test_sweep_captures_views(self, tmp_path):
        moves = []
        clock = iter(range(100))

        def actuator(pan, tilt):
            moves.append((pan, tilt))

        def capture():
            rng = np.random.default_rng(len(moves))
            return float(next(clock)), {"xyz": rng.random((16, 3)).astype(np.float32)}

        sess = ScanSession(actuator, capture, out_dir=str(tmp_path))
        views = sess.run_sweep(SweepConfig(pan_start=-30, pan_end=30, pan_step=30))
        assert [m[0] for m in moves] == [-30, 0, 30]
        assert len(views) == 3
        import os
        assert all(os.path.exists(v["path"]) for v in views)


class TestJlo:
    def test_update_and_framequery(self):
        jlo = JloRegistry()
        T_table = np.eye(4); T_table[:3, 3] = [1, 2, 0]
        table = jlo.update("table_0", T_table)
        T_obj = np.eye(4); T_obj[:3, 3] = [0.1, 0.0, 0.8]
        obj = jlo.update("mug", T_obj, parent_id=table.lo_id)
        Tw = jlo.framequery(obj.lo_id)
        np.testing.assert_allclose(Tw[:3, 3], [1.1, 2.0, 0.8])
        # relative pose of mug in table frame is the raw pose
        Tr = jlo.framequery(obj.lo_id, reference_id=table.lo_id)
        np.testing.assert_allclose(Tr, T_obj, atol=1e-12)
        assert jlo.namequery("mug").lo_id == obj.lo_id

    def test_service_registry(self):
        reg = ServiceRegistry()
        reg.register("/intersect_poly", lambda a, b: "clip")
        assert reg.exists("/intersect_poly")
        assert reg.call("/intersect_poly", 1, 2) == "clip"
        with pytest.raises(KeyError):
            reg.call("/nope")


class TestCopBridge:
    def test_answers_from_memory(self):
        from mapping_private_tpu.models.table_memory import TableMemory

        rng = np.random.default_rng(0)
        pts = rng.normal([0.3, 0.2, 0.8], 0.02, (64, 3)).astype(np.float32)
        mem = TableMemory()
        mem.update(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float), 0.7,
                   [pts], stamp=0.0)
        name = mem.tables[0].latest().objects[0].name
        cop = CopBridge(mem)
        got = cop.query([pts.mean(0), np.array([9, 9, 9.0])])
        assert got[0] == name and got[1] is None


class TestShopping:
    def test_racks_and_placement(self):
        rng = np.random.default_rng(1)
        # two racks at z=0 and z=0.5; two objects on rack 0, one on rack 1
        objs = [
            rng.normal([0.2, 0.1, 0.08], 0.02, (80, 3)),
            rng.normal([0.7, 0.1, 0.08], 0.02, (80, 3)),
            rng.normal([0.4, 0.1, 0.58], 0.02, (80, 3)),
        ]
        pts = np.vstack(objs).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)
        racks = cluster_objects_on_racks(cloud, [0.0, 0.5], band=0.2,
                                         min_pts=40)
        assert len(racks[0]) == 2 and len(racks[1]) == 1
        rack, pos = infer_object_location("heavy", racks, rack_width=1.0)
        assert rack == 0
        # best gap on rack 0 is between the two objects (~0.26..0.64)
        assert 0.25 < pos[0] < 0.7


class TestAcquisitionUtilities:
    def test_hokuyo_line_ids(self):
        from mapping_private_tpu.pipeline.acquisition import hokuyo_line_ids
        import numpy as np

        idx = np.array([0, 1, 2, 0, 1, 2, 3, 1, 2], np.float32)
        np.testing.assert_array_equal(
            hokuyo_line_ids(idx), [0, 0, 0, 1, 1, 1, 1, 2, 2])
        assert hokuyo_line_ids(np.zeros(0)).shape == (0,)

    def test_triggered_capture(self, tmp_path):
        from mapping_private_tpu.pipeline.acquisition import TriggeredCapture
        from mapping_private_tpu.io.pcd import load_pcd_arrays
        import numpy as np

        cap = TriggeredCapture(str(tmp_path))
        assert cap.trigger() is None  # nothing captured yet
        cap.push({"xyz": np.ones((5, 3), np.float32)})
        p = cap.trigger()
        assert p and load_pcd_arrays(p)["x"].shape == (5,)
        cap.push({"xyz": np.zeros((3, 3), np.float32)})
        assert cap.trigger().endswith("0001.pcd")

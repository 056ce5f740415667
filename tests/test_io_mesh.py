"""Tests for DXF/VTK mesh IO, mesh sampling, semantic-map XML parsing,
and depth-image triangulation."""
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.io import (
    corner_frame_offset,
    map_to_boxes,
    parse_semantic_map,
    read_dxf_mesh,
    read_vtk_mesh,
    sample_mesh_points,
    virtual_view_depth,
    write_dxf_mesh,
    write_vtk_mesh,
)
from mapping_private_tpu.ops.triangulation import (
    compact_mesh,
    triangulate_depth_image,
)
from mapping_private_tpu.realtime import depth_to_cloud

CAD_XML = "/root/reference/xml_to_semantic_map/data/cad_based_map.xml"


def _unit_cube():
    from mapping_private_tpu.fit.box import box_mesh
    return box_mesh([0.5, 0.5, 0.5], np.eye(3), [1, 1, 1])


class TestMeshIO:
    def test_dxf_roundtrip(self, tmp_path):
        v, t = _unit_cube()
        p = str(tmp_path / "cube.dxf")
        write_dxf_mesh(p, v, t)
        v2, t2 = read_dxf_mesh(p)
        assert len(t2) == len(t)
        # same vertex set (order may differ)
        s1 = {tuple(np.round(x, 5)) for x in v}
        s2 = {tuple(np.round(x, 5)) for x in v2}
        assert s1 == s2

    def test_vtk_roundtrip(self, tmp_path):
        v, t = _unit_cube()
        p = str(tmp_path / "cube.vtk")
        write_vtk_mesh(p, v, t)
        v2, t2 = read_vtk_mesh(p)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        assert (t2 == t).all()

    def test_mesh_sampling(self):
        v, t = _unit_cube()
        pts = sample_mesh_points(v, t, 2000, seed=0)
        assert pts.shape == (2000, 3)
        # every sample on the cube surface: one coord at 0 or 1
        on_face = np.isclose(pts, 0, atol=1e-5) | np.isclose(pts, 1, atol=1e-5)
        assert on_face.any(axis=1).all()
        assert (pts >= -1e-5).all() and (pts <= 1 + 1e-5).all()

    def test_virtual_view(self):
        v, t = _unit_cube()
        # camera looking at the cube from z = -2 (cube at z ∈ [0,1])
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [-0.5, -0.5, 2.0]  # model→camera: cube center → (0,0,2.5)
        d = virtual_view_depth(v, t, pose, image_shape=(48, 64), fx=40, fy=40)
        assert abs(d[24, 32] - 2.0) < 1e-2  # front face at depth 2
        assert d[0, 0] == 0.0


class TestSemanticMap:
    def test_parses_reference_cad_map(self):
        smap = parse_semantic_map(CAD_XML)
        assert len(smap.walls) >= 2
        assert len(smap.horizontals) >= 2
        assert len(smap.handles) >= 1
        assert len(smap.candidates) >= 1
        names = [w.name for w in smap.walls]
        assert "back-wall" in names
        counter = next(h for h in smap.horizontals if h.name == "counter")
        np.testing.assert_allclose(counter.model, [0, 0, 1, 0.85])
        # handles link to doors
        h = smap.handles[0]
        assert h.door_id in smap.by_id() or h.door_id > 0

    def test_boxes_and_offset(self):
        smap = parse_semantic_map(CAD_XML)
        boxes = map_to_boxes(smap)
        assert len(boxes) >= len(smap.walls) + len(smap.horizontals)
        off = corner_frame_offset(smap)
        assert off.shape == (3,)


class TestDepthTriangulation:
    def test_flat_wall_full_mesh(self):
        depth = jnp.full((16, 16), 1.0, jnp.float32)
        pts, valid = depth_to_cloud(depth, fx=100, fy=100)
        tris, ok = triangulate_depth_image(pts, valid, max_edge=0.05)
        assert int(ok.sum()) == 2 * 15 * 15  # every quad triangulated
        verts, t = compact_mesh(np.asarray(pts), np.asarray(tris), np.asarray(ok))
        assert len(verts) == 256 and len(t) == 450

    def test_discontinuity_not_bridged(self):
        depth = np.full((8, 8), 1.0, np.float32)
        depth[:, 4:] = 2.0  # depth jump
        pts, valid = depth_to_cloud(jnp.asarray(depth), fx=100, fy=100)
        tris, ok = triangulate_depth_image(pts, valid, max_edge=0.05)
        verts, t = compact_mesh(np.asarray(pts), np.asarray(tris), np.asarray(ok))
        # no triangle spans the jump: all triangles have consistent depth
        tz = verts[:, 2][t]
        assert (np.ptp(tz, axis=1) < 0.5).all()

    def test_invalid_pixels_skipped(self):
        depth = np.full((8, 8), 1.0, np.float32)
        depth[3, 3] = 0.0
        pts, valid = depth_to_cloud(jnp.asarray(depth), fx=100, fy=100)
        tris, ok = triangulate_depth_image(pts, valid, max_edge=0.05)
        t = np.asarray(tris)[np.asarray(ok)]
        assert 3 * 8 + 3 not in set(t.ravel())

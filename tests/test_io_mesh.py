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


class TestIntensityRender:
    """me.cpp render-to-image residue (round-4 verdict item 10)."""

    def _scene(self):
        # two triangles at different depths, distinct intensities
        v = np.array([
            [-.5, -.5, 2.0], [.5, -.5, 2.0], [0., .5, 2.0],   # near, bright
            [-3., -3., 4.0], [3., -3., 4.0], [0., 3., 4.0],   # far, dim
        ], np.float32)
        t = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        s = np.array([200., 200., 200., 40., 40., 40.], np.float32)
        return v, t, s

    def test_zbuffer_and_gouraud(self):
        from mapping_private_tpu.io.mesh import virtual_view_intensity

        v, t, s = self._scene()
        img = virtual_view_intensity(v, t, s, np.eye(4),
                                     image_shape=(64, 64), fx=30, fy=30)
        assert img.dtype == np.uint8
        center = img[32, 32]
        assert center == 200  # near triangle occludes the far one
        assert (img == 40).any()  # far triangle visible around it
        assert (img == 0).any()   # background
        # gouraud: unequal vertex intensities interpolate
        s2 = np.array([0., 255., 0., 0., 0., 0.], np.float32)
        img2 = virtual_view_intensity(v, t, s2, np.eye(4),
                                      image_shape=(64, 64), fx=30, fy=30)
        vals = np.unique(img2[img2 > 0])
        assert len(vals) > 10  # a gradient, not flat shading

    def test_ppm_roundtrip_format(self, tmp_path):
        from mapping_private_tpu.io.mesh import (
            read_ppm, virtual_view_intensity, write_ppm)

        v, t, s = self._scene()
        img = virtual_view_intensity(v, t, s, np.eye(4),
                                     image_shape=(16, 20), fx=8, fy=8)
        p = str(tmp_path / "render.ppm")
        write_ppm(p, img)
        head = open(p).read().split("\n", 3)
        assert head[0] == "P3" and head[1] == "20 16" and head[2] == "255"
        assert (read_ppm(p) == img).all()

    def test_vtk_scalars_roundtrip(self, tmp_path):
        from mapping_private_tpu.io.mesh import read_vtk_mesh, write_vtk_mesh

        v, t, s = self._scene()
        p = str(tmp_path / "mesh.vtk")
        write_vtk_mesh(p, v, t, scalars=s)
        vv, tt, ss = read_vtk_mesh(p, with_scalars=True)
        assert np.allclose(vv, v, atol=1e-5) and (tt == t).all()
        assert np.allclose(ss, s)
        # scalar-less files still read (back-compat)
        p2 = str(tmp_path / "plain.vtk")
        write_vtk_mesh(p2, v, t)
        vv2, tt2, ss2 = read_vtk_mesh(p2, with_scalars=True)
        assert ss2 is None and (tt2 == t).all()


class TestBoxlistRayIntersection:
    """boxlist_ray_intersection.cu analog (round-4 verdict item 10)."""

    def test_nearest_box_wins(self):
        import jax.numpy as jnp

        from mapping_private_tpu.realtime import boxlist_ray_intersection

        # box 0 far on-axis, box 1 near on-axis, box 2 off to the side
        bmin = jnp.asarray([[-3, -3, 8], [-.2, -.2, 2], [5, 5, 4]],
                           jnp.float32)
        bmax = jnp.asarray([[3, 3, 9], [.2, .2, 3], [6, 6, 5]], jnp.float32)
        ids, t = boxlist_ray_intersection(
            bmin, bmax, jnp.zeros(3), focallength=20.0, width=41, height=41)
        assert ids.shape == (41, 41)
        assert int(ids[20, 20]) == 2          # boxid 1 + 1: near box occludes
        assert float(t[20, 20]) == 2.0        # slab entry at z=2
        corner = int(ids[0, 0])
        assert corner in (0, 1)               # wide rays: box 0 or miss
        assert (np.asarray(ids) == 1).any()   # far box visible off-center
        assert (np.asarray(ids) == 0).any()   # some rays miss everything

    def test_origin_inside_and_behind(self):
        import jax.numpy as jnp

        from mapping_private_tpu.realtime import ray_box_tmin

        bmin = jnp.asarray([[-1, -1, -1], [-1, -1, -9]], jnp.float32)
        bmax = jnp.asarray([[1, 1, 1], [1, 1, -8]], jnp.float32)
        dirs = jnp.asarray([[0, 0, 1.]], jnp.float32)
        t = np.asarray(ray_box_tmin(jnp.zeros(3), dirs, bmin, bmax))
        assert t[0, 0] == 0.0        # origin inside: clamped entry
        assert np.isinf(t[0, 1])     # box entirely behind the ray

    def test_axis_parallel_ray(self):
        import jax.numpy as jnp

        from mapping_private_tpu.realtime import ray_box_tmin

        # ray along +z at x=2: parallel to the x-slabs of a box at x in [0,1]
        bmin = jnp.asarray([[0, -1, 3]], jnp.float32)
        bmax = jnp.asarray([[1, 1, 4]], jnp.float32)
        dirs = jnp.asarray([[0, 0, 1.]], jnp.float32)
        t_miss = np.asarray(ray_box_tmin(
            jnp.asarray([2., 0., 0.]), dirs, bmin, bmax))
        assert np.isinf(t_miss[0, 0])  # outside the parallel slab: miss
        t_hit = np.asarray(ray_box_tmin(
            jnp.asarray([.5, 0., 0.]), dirs, bmin, bmax))
        assert t_hit[0, 0] == 3.0      # inside the parallel slab: hits

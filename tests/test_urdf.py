"""Tests for URDF parsing, FK, STL loading, robot depth rendering."""
import struct

import numpy as np

from mapping_private_tpu.realtime.urdf import (
    load_stl,
    parse_urdf,
    render_robot_depth,
)

URDF = """
<robot name="arm">
  <link name="base">
    <collision>
      <origin xyz="0 0 0.1" rpy="0 0 0"/>
      <geometry><box size="0.2 0.2 0.2"/></geometry>
    </collision>
  </link>
  <link name="upper">
    <collision>
      <origin xyz="0 0 0.15" rpy="0 0 0"/>
      <geometry><cylinder radius="0.05" length="0.3"/></geometry>
    </collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 0.2" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
  </joint>
</robot>
"""


def _write_binary_stl(path, tris):
    with open(path, "wb") as fp:
        fp.write(b"\0" * 80)
        fp.write(struct.pack("<I", len(tris)))
        for t in tris:
            fp.write(struct.pack("<3f", 0, 0, 1))
            for v in t:
                fp.write(struct.pack("<3f", *v))
            fp.write(struct.pack("<H", 0))


class TestURDF:
    def test_parse_and_fk(self):
        robot = parse_urdf(URDF)
        assert robot.root == "base"
        assert set(robot.links) == {"base", "upper"}
        poses = robot.forward_kinematics()
        np.testing.assert_allclose(poses["upper"][:3, 3], [0, 0, 0.2])
        # bend the shoulder 90° about +y: upper's +z maps to +x
        poses = robot.forward_kinematics({"shoulder": np.pi / 2})
        R = poses["upper"][:3, :3]
        np.testing.assert_allclose(R @ [0, 0, 1], [1, 0, 0], atol=1e-12)

    def test_stl_roundtrip(self, tmp_path):
        tris = [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[0, 0, 1], [1, 0, 1], [0, 1, 1]],
        ]
        p = str(tmp_path / "m.stl")
        _write_binary_stl(p, tris)
        v, t = load_stl(p)
        assert v.shape == (6, 3) and t.shape == (2, 3)
        np.testing.assert_allclose(v[:3], tris[0])

    def test_ascii_stl(self, tmp_path):
        p = str(tmp_path / "a.stl")
        with open(p, "w") as fp:
            fp.write("solid a\nfacet normal 0 0 1\nouter loop\n")
            fp.write("vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n")
            fp.write("endloop\nendfacet\nendsolid a\n")
        v, t = load_stl(p)
        assert v.shape == (3, 3)

    def test_render_robot_depth_and_self_filter(self):
        from mapping_private_tpu.realtime import background_subtract
        import jax.numpy as jnp

        robot = parse_urdf(URDF)
        # camera 1.5 m in front of the robot, looking along +z at it
        cam = np.eye(4)
        cam[:3, 3] = [0, -0.1, 1.0]  # root → camera: robot ~1m ahead
        d = render_robot_depth(robot, cam, image_shape=(64, 64), fx=60, fy=60)
        assert (d > 0).sum() > 20  # robot visible
        assert abs(d[d > 0].min() - 0.9) < 0.2  # base front face ~0.9-1.1m
        # self-filter: measured scene = wall at 2m with the robot in front
        meas = np.full((64, 64), 2.0, np.float32)
        robot_px = d > 0
        meas[robot_px] = d[robot_px]  # kinect sees the robot
        keep = np.asarray(background_subtract(
            jnp.asarray(meas), jnp.asarray(d), threshold=0.1))
        assert not keep[robot_px].any()  # robot cut
        assert keep[~robot_px].all()  # wall kept

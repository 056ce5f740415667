"""Visualization plane (io/viz.py) — colored PLY + marker JSON outputs
render-parseable by standard tooling (the RViz-marker analog)."""
import json
import os

import jax
import numpy as np

from mapping_private_tpu.core import PointCloud
from mapping_private_tpu.io.viz import (
    Marker,
    dump_viz,
    hough_segments_viz,
    load_markers_json,
    save_markers_json,
    save_ply,
    table_detection_viz,
)


def _parse_ply(path):
    with open(path) as fp:
        lines = fp.read().splitlines()
    assert lines[0] == "ply"
    n = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
    hdr_end = lines.index("end_header")
    props = [l.split()[-1] for l in lines if l.startswith("property")]
    body = lines[hdr_end + 1:hdr_end + 1 + n]
    return n, props, body


def test_save_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    rgb = np.full((50, 3), 128, np.uint8)
    p = str(tmp_path / "c.ply")
    save_ply(p, xyz, rgb)
    n, props, body = _parse_ply(p)
    assert n == 50
    assert props == ["x", "y", "z", "red", "green", "blue"]
    row = body[0].split()
    np.testing.assert_allclose([float(v) for v in row[:3]], xyz[0], atol=1e-5)
    assert [int(v) for v in row[3:]] == [128, 128, 128]


def test_markers_json_roundtrip(tmp_path):
    ms = [
        Marker(kind="cube", center=(1, 2, 3), scale=(0.1, 0.2, 0.3),
               color=(10, 20, 30), label="box"),
        Marker(kind="polygon", center=(0, 0, 0.7),
               points=[[0, 0, 0.7], [1, 0, 0.7], [1, 1, 0.7]]),
    ]
    p = str(tmp_path / "m.json")
    save_markers_json(p, ms)
    back = load_markers_json(p)
    assert back[0].kind == "cube" and tuple(back[0].color) == (10, 20, 30)
    assert len(back[1].points) == 3
    # plain-json parseable for external viewers
    with open(p) as fp:
        raw = json.load(fp)
    assert raw[0]["label"] == "box"


def test_hough_viz_end_to_end(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_hough import _tabletop_scene

    from mapping_private_tpu.models.hough_segmentation import (
        HoughConfig, hough_segment,
    )

    pts, _, _ = _tabletop_scene(2)
    cloud = PointCloud.from_numpy(pts)
    segs = hough_segment(cloud, jax.random.PRNGKey(6),
                         HoughConfig(max_objects=4, min_inliers=80))
    xyz, rgb, markers = hough_segments_viz(cloud, segs)
    assert len(xyz) == len(rgb) == int(np.asarray(cloud.mask).sum())
    kinds = {m.kind for m in markers}
    assert "cylinder" in kinds or "cube" in kinds
    out = dump_viz(str(tmp_path), "scene", xyz, rgb, markers)
    n, props, _ = _parse_ply(out["ply"])
    assert n == len(xyz)
    assert load_markers_json(out["markers"])


def test_table_detection_viz(tmp_path):
    from test_table_detector import synthetic_table_scene

    from mapping_private_tpu.models.table_detector import (
        TableDetectorConfig, detect_table,
    )

    cloud = PointCloud.from_numpy(synthetic_table_scene())
    det, down = detect_table(
        cloud, jax.random.PRNGKey(0),
        TableDetectorConfig(down_capacity=4096, sac_hypotheses=256),
    )
    xyz, rgb, markers = table_detection_viz(det, down)
    labels = {m.label for m in markers}
    assert "table_hull" in labels
    assert sum(m.kind == "cube" for m in markers) == 2  # the two objects
    # claimed points are colored differently from background grey
    assert (rgb != 150).any()

"""Tests for the incremental scan-to-map tracker."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.se3 import se3_exp, se3_inverse, se3_apply
from mapping_private_tpu.registration.scan_to_map import (
    ScanToMapTracker,
    TrackerConfig,
    VoxelMap,
    integrate_scan,
)


def _surface_scan(T_world, n=3000, seed=0):
    """Scan of a fixed wavy world surface as seen from pose T_world
    (scan = world points moved into the sensor frame)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1.5, 1.5, (n, 2))
    z = 0.3 * np.sin(2.0 * xy[:, 0]) + 0.2 * np.cos(2.5 * xy[:, 1])
    world = np.column_stack([xy, z]).astype(np.float32)
    dzdx = 0.3 * 2.0 * np.cos(2.0 * xy[:, 0])
    dzdy = -0.2 * 2.5 * np.sin(2.5 * xy[:, 1])
    nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    Tinv = np.asarray(se3_inverse(jnp.asarray(T_world)))
    scan = world @ Tinv[:3, :3].T + Tinv[:3, 3]
    scan_n = nrm @ Tinv[:3, :3].T
    return (jnp.asarray(scan), jnp.asarray(scan_n.astype(np.float32)),
            jnp.ones((n,), bool))


class TestVoxelMap:
    def test_integration_dedup(self):
        vm = VoxelMap.empty(1024, 0.1)
        pts = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (500, 3)),
                          jnp.float32)
        nrm = jnp.zeros_like(pts)
        m = jnp.ones((500,), bool)
        vm = integrate_scan(vm, pts, nrm, m)
        c1 = int(vm.count())
        assert 0 < c1 <= 500
        # re-inserting the same points must not grow the map
        vm2 = integrate_scan(vm, pts, nrm, m)
        assert int(vm2.count()) == c1

    def test_capacity_bound(self):
        vm = VoxelMap.empty(64, 0.01)
        pts = jnp.asarray(np.random.default_rng(1).uniform(0, 10, (500, 3)),
                          jnp.float32)
        vm = integrate_scan(vm, pts, jnp.zeros_like(pts), jnp.ones((500,), bool))
        assert int(vm.count()) <= 64


class TestTracker:
    def test_tracks_trajectory(self):
        cfg = TrackerConfig(map_capacity=16384, map_voxel=0.05,
                            keyframe_trans=0.05)
        tracker = ScanToMapTracker(cfg)
        # ground-truth poses: translate along x with slight yaw
        gt = []
        for k in range(6):
            xi = jnp.asarray([0.06 * k, 0.01 * k, 0.0, 0.0, 0.0, 0.02 * k],
                             jnp.float32)
            gt.append(se3_exp(xi))
        errs = []
        for k, T in enumerate(gt):
            scan = _surface_scan(T, seed=k)
            pose, _ = tracker.track(*scan)
            d = np.asarray(pose)[:3, 3] - np.asarray(T)[:3, 3]
            errs.append(np.linalg.norm(d))
        assert errs[-1] < 0.02, f"tracking drifted: {errs}"
        assert int(tracker.map.count()) > 1000
        assert len(tracker.keyframe_poses) >= 2

    def test_relax_with_loop_closure(self):
        cfg = TrackerConfig(map_capacity=8192, map_voxel=0.05,
                            keyframe_trans=0.03)
        tracker = ScanToMapTracker(cfg)
        for k in range(4):
            T = se3_exp(jnp.asarray([0.05 * k, 0, 0, 0, 0, 0], jnp.float32))
            tracker.track(*_surface_scan(T, seed=10 + k))
        K = len(tracker.keyframe_poses)
        if K >= 2:
            # perfect loop closure from keyframe 0 to last
            Z = jnp.asarray(
                np.asarray(se3_inverse(tracker.keyframe_poses[0]))
                @ np.asarray(tracker.keyframe_poses[-1])
            )
            tracker.add_loop_closure(0, K - 1, Z)
            relaxed = tracker.relax()
            assert relaxed.shape == (K, 4, 4)
            assert np.isfinite(np.asarray(relaxed)).all()


class TestBuildMapApp:
    def test_cli_end_to_end(self, tmp_path, capsys):
        import json
        from mapping_private_tpu.io.pcd import save_pcd
        from mapping_private_tpu.apps.build_map import main

        rng = np.random.default_rng(0)
        xy = rng.uniform(-1.5, 1.5, (2500, 2))
        z = 0.3 * np.sin(2.0 * xy[:, 0]) + 0.2 * np.cos(2.5 * xy[:, 1])
        world = np.column_stack([xy, z]).astype(np.float32)
        paths = []
        for k in range(3):
            T = np.asarray(se3_exp(jnp.asarray(
                [0.04 * k, 0.0, 0.0, 0, 0, 0.01 * k], jnp.float32)))
            Tinv = np.linalg.inv(T)
            scan = world @ Tinv[:3, :3].T + Tinv[:3, 3]
            p = str(tmp_path / f"scan{k}.pcd")
            save_pcd(p, {"xyz": scan.astype(np.float32)})
            paths.append(p)
        out_map = str(tmp_path / "map.pcd")
        rc = main(paths + ["--json", "--out-map", out_map,
                           "--keyframe-trans", "0.03"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["map_points"] > 500
        T_last = np.asarray(out["trajectory"][-1])
        assert abs(T_last[0, 3] - 0.08) < 0.02  # recovered x motion
        import os
        assert os.path.exists(out_map)


class TestTrackerCheckpoint:
    def test_checkpoint_resume_continues_tracking(self, tmp_path):
        cfg = TrackerConfig(map_capacity=8192, map_voxel=0.05,
                            keyframe_trans=0.04)
        tracker = ScanToMapTracker(cfg)
        for k in range(3):
            T = se3_exp(jnp.asarray([0.05 * k, 0, 0, 0, 0, 0], jnp.float32))
            tracker.track(*_surface_scan(T, seed=20 + k))
        path = str(tmp_path / "tracker.npz")
        tracker.checkpoint(path)

        back = ScanToMapTracker.restore(path, cfg)
        assert int(back.map.count()) == int(tracker.map.count())
        assert len(back.keyframe_poses) == len(tracker.keyframe_poses)
        # restored tracker keeps localizing against the restored map
        T3 = se3_exp(jnp.asarray([0.15, 0, 0, 0, 0, 0], jnp.float32))
        pose, _ = back.track(*_surface_scan(T3, seed=23))
        d = np.asarray(pose)[:3, 3] - np.asarray(T3)[:3, 3]
        assert np.linalg.norm(d) < 0.02

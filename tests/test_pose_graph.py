"""Property tests for the pose-graph optimizer (SURVEY §7 hard part (e):
no reference implementation exists, so gauge freedom / residual decrease /
recovery properties are the spec)."""
import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.se3 import se3_exp, se3_inverse, se3_log
from mapping_private_tpu.parallel.mesh import make_mesh
from mapping_private_tpu.registration.pose_graph import (
    build_normal_equations,
    edge_residual,
    make_sharded_pose_graph_step,
    optimize_pose_graph,
)


def _ring_graph(K=12, noise=0.05, seed=0):
    """Ground-truth poses on a circle, odometry edges + loop closure."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        xi = np.array([np.cos(ang), np.sin(ang), 0, 0, 0, ang], np.float32)
        gt.append(np.asarray(se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)
    edges, meas = [], []
    for k in range(K):
        j = (k + 1) % K
        Z = np.asarray(se3_inverse(jnp.asarray(gt[k])) @ gt[j])
        edges.append([k, j])
        meas.append(Z)
    # initial guess: ground truth perturbed
    init = []
    for k in range(K):
        pert = rng.normal(0, noise, 6).astype(np.float32)
        pert[0] *= 0  # keep anchor well-conditioned
        init.append(np.asarray(jnp.asarray(gt[k]) @ se3_exp(jnp.asarray(pert))))
    init[0] = gt[0]  # anchor at ground truth
    return (jnp.asarray(np.stack(init)), jnp.asarray(np.array(edges, np.int32)),
            jnp.asarray(np.stack(meas)), gt)


def _pose_errors(poses, gt):
    errs = []
    for k in range(len(gt)):
        d = se3_log(se3_inverse(jnp.asarray(gt[k])) @ poses[k])
        errs.append(float(jnp.linalg.norm(d)))
    return np.array(errs)


class TestPoseGraph:
    def test_zero_residual_at_ground_truth(self):
        init, edges, meas, gt = _ring_graph(noise=0.0)
        r = edge_residual(jnp.asarray(gt[0]), jnp.asarray(gt[1]), meas[0])
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)

    def test_residual_decreases_and_recovers(self):
        init, edges, meas, gt = _ring_graph(noise=0.05)
        before = _pose_errors(init, gt).mean()
        poses, errs = optimize_pose_graph(init, edges, meas, iters=10)
        errs = np.asarray(errs)
        assert errs[-1] < errs[0] * 1e-3  # strong decrease
        after = _pose_errors(poses, gt).mean()
        assert after < 0.05 * before

    def test_gauge_anchored(self):
        init, edges, meas, gt = _ring_graph(noise=0.05, seed=1)
        poses, _ = optimize_pose_graph(init, edges, meas, iters=10)
        d0 = se3_log(se3_inverse(jnp.asarray(gt[0])) @ poses[0])
        assert float(jnp.linalg.norm(d0)) < 1e-3  # node 0 pinned

    def test_weighted_edges(self):
        init, edges, meas, gt = _ring_graph(noise=0.08, seed=2)
        # corrupt one measurement, give it ~zero weight → still recovers
        meas = meas.at[3].set(jnp.asarray(se3_exp(jnp.asarray(
            [0.5, -0.5, 0.3, 0.2, 0.1, 0.4], ))))
        w = jnp.ones(edges.shape[0]).at[3].set(1e-4)
        poses, _ = optimize_pose_graph(init, edges, meas, weights=w, iters=12)
        after = _pose_errors(poses, gt)
        assert after.mean() < 0.05

    def test_sharded_matches_single_device(self):
        init, edges, meas, gt = _ring_graph(K=16, noise=0.05, seed=3)
        mesh = make_mesh((4, 2))
        step, shardings = make_sharded_pose_graph_step(mesh)
        w = jnp.ones(edges.shape[0])
        poses_sh = init
        for _ in range(5):
            poses_sh, err_sh = step(poses_sh, edges, meas, w)
        poses_1, errs = optimize_pose_graph(init, edges, meas, iters=5)
        np.testing.assert_allclose(
            np.asarray(poses_sh), np.asarray(poses_1), atol=1e-4
        )

    def test_sharded_at_scale_loop_closures(self):
        """K=256 keyframes with accumulated odometry drift + long-range
        loop closures, edges sharded over the 8-device mesh (VERDICT r3
        item 5: the sharded path must be proven past toy ring shapes).
        Property gates: gauge anchor, error decrease across sharded GN
        iterations, sharded-vs-single parity, and the loop closures
        actually correcting the drift (vs the same graph without them)."""
        K = 256
        rng = np.random.default_rng(11)
        ang = 2 * np.pi * np.arange(K) / K
        gt = np.stack([
            np.asarray(se3_exp(jnp.asarray(
                [3 * np.cos(a), 3 * np.sin(a), 0.2 * a, 0, 0, a],
                jnp.float32)))
            for a in ang
        ])
        # odometry: true relative motion corrupted per step → drift when
        # chained; loop closures measured exactly
        odo_edges = [(k, k + 1) for k in range(K - 1)]
        # revisit-the-origin closures: every 16th keyframe re-observes
        # node 0, the classic drift-correcting topology
        loop_edges = [(0, k) for k in range(16, K, 16)]
        edges_l = odo_edges + loop_edges
        meas_l, w_odo = [], []
        init = [gt[0]]
        for k, j in odo_edges:
            Z = np.linalg.inv(gt[k]) @ gt[j]
            eps = rng.normal(0, 0.01, 6).astype(np.float32)
            Zn = np.asarray(se3_exp(jnp.asarray(eps))) @ Z
            meas_l.append(Zn.astype(np.float32))
            init.append((init[-1] @ Zn).astype(np.float32))
        for k, j in loop_edges:
            meas_l.append((np.linalg.inv(gt[k]) @ gt[j]).astype(np.float32))
        n_e = len(edges_l)
        E = -(-n_e // 8) * 8  # pad to the mesh size
        edges = np.zeros((E, 2), np.int32)
        edges[:n_e] = np.asarray(edges_l, np.int32)
        meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        meas[:n_e] = np.stack(meas_l)
        w = np.zeros((E,), np.float32)
        w[:n_e] = 1.0
        init = jnp.asarray(np.stack(init))
        edges_j, meas_j, w_j = (
            jnp.asarray(edges), jnp.asarray(meas), jnp.asarray(w))

        drift_before = _pose_errors(init, gt)
        assert drift_before[-1] > 0.05  # the chained guess really drifted

        mesh = make_mesh((4, 2))
        step, _ = make_sharded_pose_graph_step(mesh)
        poses_sh, errs = init, []
        for _ in range(8):
            poses_sh, err = step(poses_sh, edges_j, meas_j, w_j)
            errs.append(float(err))
        # error decreases and converges
        assert errs[-1] < errs[0] * 1e-2
        assert errs[1] < errs[0]
        # gauge: node 0 pinned to its anchor
        d0 = se3_log(se3_inverse(jnp.asarray(gt[0])) @ poses_sh[0])
        assert float(jnp.linalg.norm(d0)) < 1e-3
        # sharded == single-device
        poses_1, _ = optimize_pose_graph(
            init, edges_j, meas_j, weights=w_j, iters=8)
        np.testing.assert_allclose(
            np.asarray(poses_sh), np.asarray(poses_1), atol=1e-3)
        # loop closures correct the drift: without them (weights zeroed)
        # the far end of the trajectory stays off by the accumulated
        # odometry error; with them it snaps near ground truth
        w_noloop = w_j.at[len(odo_edges):].set(0.0)
        poses_nl, _ = optimize_pose_graph(
            init, edges_j, meas_j, weights=w_noloop, iters=8)
        err_with = _pose_errors(poses_sh, gt)
        err_without = _pose_errors(poses_nl, gt)
        assert err_with.max() < 0.25 * err_without.max()
        # absolute floor set by the odometry noise itself (σ=0.01/step —
        # the MAP solution is not ground truth)
        assert err_with.mean() < 0.05

    def test_padded_edges_are_noops(self):
        init, edges, meas, gt = _ring_graph(K=8, noise=0.03, seed=4)
        E = edges.shape[0]
        pad = 8
        edges_p = jnp.concatenate([edges, jnp.zeros((pad, 2), jnp.int32)])
        meas_p = jnp.concatenate([meas, jnp.tile(jnp.eye(4), (pad, 1, 1))])
        w_p = jnp.concatenate([jnp.ones(E), jnp.zeros(pad)])
        p1, _ = optimize_pose_graph(init, edges, meas, iters=6)
        p2, _ = optimize_pose_graph(init, edges_p, meas_p, weights=w_p, iters=6)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)

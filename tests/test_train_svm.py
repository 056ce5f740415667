"""Kernel-SVM training: dual-optimality (KKT) checks, round-trip into the
libsvm model format, and multiclass accuracy — the capability behind the
reference's bundled cloud_algos/svm/*.model files."""
import numpy as np
import pytest


def _blobs(rng, n_per, centers, scale=0.35):
    X, y = [], []
    for c, mu in enumerate(centers):
        X.append(rng.normal(mu, scale, (n_per, len(mu))))
        y.append(np.full(n_per, c))
    return np.vstack(X).astype(np.float32), np.concatenate(y)


class TestBinarySMO:
    def test_kkt_and_margin(self):
        from mapping_private_tpu.classify.train_svm import (
            train_svc_ovo, predict_ovo, rbf_kernel,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        X, y = _blobs(rng, 40, [(-1.5, 0.0), (1.5, 0.0)])
        m = train_svc_ovo(X, y, 2, C=10.0, gamma=0.5, tol=1e-4)
        pred, _ = predict_ovo(m, X)
        assert np.mean(np.asarray(pred) == y) == 1.0

        # KKT: recompute dual gradient; free SVs sit on the margin
        ay = np.zeros(len(X))
        ok = m.pair_idx[0] >= 0
        ay[m.pair_idx[0][ok]] = m.alpha_y[0][ok]
        K = np.asarray(rbf_kernel(jnp.asarray(X), jnp.asarray(X), m.gamma))
        dec = K @ ay - m.rho[0]
        ysgn = np.where(y == 0, 1.0, -1.0)
        alpha = np.abs(ay)
        free = (alpha > 1e-6) & (alpha < 10.0 - 1e-6)
        if free.any():
            np.testing.assert_allclose(
                (ysgn * dec)[free], 1.0, atol=5e-3
            )
        # bounded SVs inside or on margin; non-SVs outside
        assert np.all((ysgn * dec)[alpha <= 1e-6] > 1.0 - 5e-3)
        # equality constraint y^T alpha = 0
        assert abs(np.sum(ay)) < 1e-5

    def test_nonlinear_needs_rbf(self):
        """Concentric rings: linearly inseparable, RBF solves it."""
        from mapping_private_tpu.classify.train_svm import (
            train_svc_ovo, predict_ovo,
        )

        rng = np.random.default_rng(1)
        ang = rng.uniform(0, 2 * np.pi, 120)
        r = np.where(np.arange(120) < 60, 0.5, 2.0)
        X = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        X += rng.normal(0, 0.08, X.shape)
        y = (np.arange(120) >= 60).astype(int)
        m = train_svc_ovo(X.astype(np.float32), y, 2, C=5.0, gamma=1.0)
        pred, _ = predict_ovo(m, X.astype(np.float32))
        assert np.mean(np.asarray(pred) == y) > 0.97


class TestMulticlassOVO:
    def test_four_blobs_heldout(self):
        from mapping_private_tpu.classify.train_svm import (
            train_svc_ovo, predict_ovo,
        )

        rng = np.random.default_rng(2)
        centers = [(-2, -2), (2, -2), (-2, 2), (2, 2)]
        Xtr, ytr = _blobs(rng, 30, centers)
        Xte, yte = _blobs(rng, 15, centers)
        m = train_svc_ovo(Xtr, ytr, 4, C=10.0, gamma=0.5)
        pred, votes = predict_ovo(m, Xte)
        assert np.mean(np.asarray(pred) == yte) > 0.95
        assert votes.shape == (len(Xte), 4)

    def test_libsvm_roundtrip(self, tmp_path):
        """to_libsvm_model → save → load → svm_predict_batch agrees with
        predict_ovo, proving retrained models drop in for bundled ones."""
        from mapping_private_tpu.classify.train_svm import (
            train_svc_ovo, predict_ovo, to_libsvm_model, save_libsvm_model,
        )
        from mapping_private_tpu.classify.libsvm import (
            load_libsvm_model, svm_predict_batch,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        centers = [(-2, 0, 0), (2, 0, 0), (0, 2.5, 0)]
        Xtr, ytr = _blobs(rng, 25, centers)
        Xte, yte = _blobs(rng, 10, centers)
        m = train_svc_ovo(Xtr, ytr, 3, C=10.0, gamma=0.3)
        sm = to_libsvm_model(m)
        path = str(tmp_path / "retrained.model")
        save_libsvm_model(sm, path)
        loaded = load_libsvm_model(path)
        assert loaded.nr_class == 3
        p1, _ = predict_ovo(m, Xte)
        p2 = svm_predict_batch(loaded, jnp.asarray(Xte))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        assert np.mean(np.asarray(p2) == yte) > 0.95

"""Tests for libsvm prediction parity, subspace classification, linear SVM."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from mapping_private_tpu.classify import (
    load_libsvm_model,
    load_scale_params,
    scale_features,
    svm_predict_batch,
    train_subspaces,
    classify_subspace,
    train_linear_svm,
    predict_linear,
)

GRSD_MODEL = "/root/reference/cloud_algos/svm/grsd.model"
GRSD_SCP = "/root/reference/cloud_algos/svm/grsd.scp"


def _reference_svm_predict(model, x):
    """Pure-python svm_predict faithful to libsvm's spec — the oracle."""
    sv = model.support_vectors
    if model.kernel == "rbf":
        K = np.exp(-model.gamma * ((sv - x) ** 2).sum(1))
    elif model.kernel == "linear":
        K = sv @ x
    else:
        raise ValueError(model.kernel)
    C = model.nr_class
    starts = np.concatenate([[0], np.cumsum(model.nr_sv)])
    votes = np.zeros(C, int)
    p = 0
    for i in range(C):
        for j in range(i + 1, C):
            dec = (
                K[starts[i]:starts[i+1]] @ model.sv_coef[j-1, starts[i]:starts[i+1]]
                + K[starts[j]:starts[j+1]] @ model.sv_coef[i, starts[j]:starts[j+1]]
                - model.rho[p]
            )
            votes[i if dec > 0 else j] += 1
            p += 1
    return model.labels[np.argmax(votes)]


class TestLibSVM:
    def test_load_bundled_model(self):
        m = load_libsvm_model(GRSD_MODEL)
        assert m.svm_type == "c_svc" and m.kernel == "rbf"
        assert m.nr_class == 26
        assert m.support_vectors.shape[0] == 372
        assert m.sv_coef.shape == (25, 372)
        assert int(m.nr_sv.sum()) == 372

    def test_batched_predict_matches_reference(self):
        m = load_libsvm_model(GRSD_MODEL)
        rng = np.random.default_rng(0)
        # mix of real support vectors and random points in [-1, 1]
        xs = np.vstack([
            m.support_vectors[::37],
            rng.uniform(-1, 1, (24, m.support_vectors.shape[1])),
        ]).astype(np.float32)
        got = np.asarray(svm_predict_batch(m, jnp.asarray(xs)))
        want = np.array([_reference_svm_predict(m, x) for x in xs])
        assert (got == want).all()

    def test_scale_params(self):
        lower, upper, ranges = load_scale_params(GRSD_SCP)
        assert lower == -1 and upper == 1
        x = jnp.asarray(ranges[:, 1][None, :], jnp.float32)  # feature = fmax
        scaled = np.asarray(scale_features(x, lower, upper, ranges))
        nz = ranges[:, 1] != ranges[:, 0]
        np.testing.assert_allclose(scaled[0][nz], 1.0, atol=1e-5)


class TestSubspace:
    def test_classifies_synthetic_classes(self):
        rng = np.random.default_rng(1)
        # three classes living in different 2D subspaces of R^10
        bases = [rng.normal(size=(2, 10)) for _ in range(3)]
        train = [rng.normal(size=(64, 2)) @ b for b in bases]
        clf = train_subspaces(train, dim_subspace=2)
        test = np.vstack([rng.normal(size=(32, 2)) @ b for b in bases]).astype(np.float32)
        want = np.repeat([0, 1, 2], 32)
        got, sim = classify_subspace(clf, jnp.asarray(test))
        assert (np.asarray(got) == want).mean() > 0.95
        assert sim.shape == (96, 3)


class TestLinearSVM:
    def test_separable(self):
        rng = np.random.default_rng(2)
        n = 200
        X = rng.normal(size=(3 * n, 4)).astype(np.float32)
        X[:n, 0] += 4; X[n:2*n, 1] += 4; X[2*n:, 2] += 4
        y = np.repeat([0, 1, 2], n)
        W = train_linear_svm(jnp.asarray(X), jnp.asarray(y), 3, C=1.0)
        pred, _ = predict_linear(W, jnp.asarray(X))
        assert (np.asarray(pred) == y).mean() > 0.97


class TestReferenceLibsvmOracle:
    """Cross-check against the REFERENCE'S OWN vendored libsvm fork,
    compiled at test time (tests/svm_oracle_driver.cpp + libsvm_asako/
    libSVM.cpp) — validating our batched predictor against the
    reference's actual computation rather than our reading of it."""

    LIBSVM_DIR = ("/root/reference/color_feature_classification/src/"
                  "libsvm_and_linear/libsvm_asako")

    def _build_oracle(self, tmp_path):
        import shutil
        import subprocess

        if shutil.which("g++") is None:
            pytest.skip("no g++")
        exe = str(tmp_path / "svm_oracle")
        src = os.path.join(os.path.dirname(__file__), "svm_oracle_driver.cpp")
        r = subprocess.run(
            ["g++", "-O2", "-w", f"-I{self.LIBSVM_DIR}", src,
             os.path.join(self.LIBSVM_DIR, "libSVM.cpp"), "-o", exe],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[:200]}")
        return exe

    def test_batched_predict_matches_reference_binary(self, tmp_path):
        import subprocess

        exe = self._build_oracle(tmp_path)
        m = load_libsvm_model(GRSD_MODEL)
        rng = np.random.default_rng(1)
        X = rng.uniform(-1.2, 1.2, (300, 20)).astype(np.float64)
        lines = "\n".join(
            " ".join(f"{v:.10g}" for v in row) for row in X)
        out = subprocess.run([exe, GRSD_MODEL], input=lines,
                             capture_output=True, text=True)
        ref = np.array([float(v) for v in out.stdout.split()])
        assert len(ref) == len(X)
        assert len(np.unique(ref)) >= 4  # inputs straddle class boundaries
        ours = np.asarray(svm_predict_batch(m, jnp.asarray(X, jnp.float32)))
        assert float((ours == ref).mean()) == 1.0

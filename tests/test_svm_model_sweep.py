"""Predictor parity across ALL bundled SVM models (round-4 verdict item 6).

The reference ships 9 trained models + 10 `.scp` scaling files
(/root/reference/cloud_algos/svm/) spanning 4-26 classes, 20-66 input
channels, and several GRSD variants; round 4 proved exact-prediction
parity only for grsd.model.  This sweep loads EVERY model with its
`.scp`, scales random raw-domain features through our pipeline
(classify.libsvm scale_features), and requires 100% prediction agreement
with the reference's own vendored libsvm fork compiled at test time
(tests/svm_oracle_driver.cpp — the same oracle the grsd test uses).
"""
import glob
import os
import zlib
import shutil
import subprocess

import numpy as np
import pytest

SVM_DIR = "/root/reference/cloud_algos/svm"
LIBSVM_DIR = ("/root/reference/color_feature_classification/src/"
              "libsvm_and_linear/libsvm_asako")
MODELS = sorted(glob.glob(os.path.join(SVM_DIR, "*.model")))


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    tmp = tmp_path_factory.mktemp("svm_sweep_oracle")
    exe = str(tmp / "svm_oracle")
    src = os.path.join(os.path.dirname(__file__), "svm_oracle_driver.cpp")
    r = subprocess.run(
        ["g++", "-O2", "-w", f"-I{LIBSVM_DIR}", src,
         os.path.join(LIBSVM_DIR, "libSVM.cpp"), "-o", exe],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:200]}")
    return exe


@pytest.mark.parametrize(
    "model_path", MODELS, ids=[os.path.basename(m) for m in MODELS])
def test_bundled_model_parity(model_path, oracle):
    import jax.numpy as jnp

    from mapping_private_tpu.classify.libsvm import (
        load_libsvm_model, load_scale_params, scale_features,
        svm_predict_batch)

    m = load_libsvm_model(model_path)
    scp = model_path[: -len(".model")] + ".scp"
    lower, upper, ranges = load_scale_params(scp)
    d = m.support_vectors.shape[1]
    assert len(ranges) >= d, (
        f"{os.path.basename(scp)}: only {len(ranges)} scale rows for "
        f"{d} SV channels")

    # raw-domain samples spanning (and 10% beyond) each channel's training
    # range, pushed through OUR .scp scaling — the oracle receives the
    # identical scaled values, so any disagreement is the predictor's
    rng = np.random.default_rng(zlib.crc32(os.path.basename(model_path).encode()))
    span = ranges[:d, 1] - ranges[:d, 0]
    lo = ranges[:d, 0] - 0.1 * span
    hi = ranges[:d, 1] + 0.1 * span
    X = rng.uniform(lo, hi, (100, d))
    Xs = np.asarray(
        scale_features(jnp.asarray(X, jnp.float32), lower, upper,
                       ranges[:d]), np.float64)
    # uniform random points sit far from every SV in high dimension and
    # can collapse to one predicted class — add SV-neighborhood samples
    # (already in scaled space) so many one-vs-one boundaries are crossed
    sv = np.asarray(m.support_vectors, np.float64)
    pick = rng.integers(0, len(sv), 150)
    near = sv[pick] + rng.normal(0, 0.15, (150, d))
    Xs = np.concatenate([Xs, near.astype(np.float32).astype(np.float64)])

    lines = "\n".join(" ".join(f"{v:.10g}" for v in row) for row in Xs)
    out = subprocess.run([oracle, model_path], input=lines,
                         capture_output=True, text=True)
    ref = np.array([float(v) for v in out.stdout.split()])
    assert len(ref) == len(Xs), out.stderr[:200]

    ours = np.asarray(svm_predict_batch(m, jnp.asarray(Xs, jnp.float32)))
    agree = float((ours == ref).mean())
    n_classes = len(np.unique(ref))
    assert n_classes >= min(3, len(m.labels)), (
        f"degenerate sweep: oracle only predicted {n_classes} classes")
    assert agree == 1.0, (
        f"{os.path.basename(model_path)}: {agree:.3%} agreement "
        f"({n_classes} classes exercised)")


def test_all_scp_files_parse():
    """Every bundled .scp (including the model-less teapot one) parses
    with finite ranges."""
    from mapping_private_tpu.classify.libsvm import load_scale_params

    scps = sorted(glob.glob(os.path.join(SVM_DIR, "*.scp")))
    assert len(scps) == 10
    for p in scps:
        lower, upper, ranges = load_scale_params(p)
        assert (lower, upper) == (-1.0, 1.0)
        assert np.isfinite(ranges).all() and len(ranges) >= 20

"""Reference-protocol classification evaluation gates (leave-one-out — NOT
resubstitution; color_feature_classification/scripts/demos/
2.leave_one_out.sh + calcRate.sh semantics over the full 63-object
corpus).

The per-view g/r features were extracted once on the TPU
(scripts/extract_corpus.py → scripts/run_evaluation.py, full rate table
in EVALUATION.json) and are committed as tests/data_corpus_features_gr.npz
so the protocol itself (fold-retrained own-subspace, full others, max
projection; SVM view-fold cross-validation) runs in the suite.
Feature-extraction parity is covered separately by the golden-corpus
bit-parity tests (test_golden_parity.py)."""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data_corpus_features_gr.npz")


@pytest.fixture(scope="module")
def corpus():
    z = np.load(DATA, allow_pickle=True)
    return z["features_g"], z["features_r"], z["labels"], list(z["names"])


def test_leave_one_out_subspace_r(corpus):
    from mapping_private_tpu.classify.evaluate import leave_one_out_subspace

    _, Fr, L, names = corpus
    assert len(names) == 63 and len(L) == 63 * 24
    r = leave_one_out_subspace(Fr, L, names, "r")
    # recorded full-corpus rate (EVALUATION.json); generous slack for
    # cross-backend numeric drift
    assert r.rate > 0.85, r.rate


def test_leave_one_out_subspace_g_weak_feature(corpus):
    """GRSD-20 alone is a weak descriptor — the protocol must expose that
    (a resubstitution harness would not)."""
    from mapping_private_tpu.classify.evaluate import leave_one_out_subspace

    Fg, _, L, names = corpus
    r = leave_one_out_subspace(Fg, L, names, "g")
    assert 0.25 < r.rate < 0.75, r.rate


def test_svm_crossval_r(corpus):
    from mapping_private_tpu.classify.evaluate import crossval_svm

    _, Fr, L, names = corpus
    r = crossval_svm(Fr, L, names, n_folds=4)
    assert r.rate > 0.80, r.rate


def test_leave_one_out_full_reference_chain_r(corpus):
    """The reference's complete preprocessing chain (0.calcNormalization
    bin scaling + FILE_MODE WHITENING in compressFeature) measured on the
    committed corpus: slightly better than the unwhitened headline
    (EVALUATION.md records 91.87 % vs 91.20 %), and the core computation
    is anchored by tests/test_subspace_train_oracle.py."""
    from mapping_private_tpu.classify.evaluate import leave_one_out_subspace

    _, Fr, L, names = corpus
    r = leave_one_out_subspace(Fr, L, names, "r", whiten=True,
                               bin_normalize=True)
    assert r.rate > 0.86, r.rate


def test_whitening_without_normalization_collapses(corpus):
    """Guard the documented failure mode: whitening raw-scale VOSCH
    features (eigenvalue spread ~1e9 in f32) amplifies noise dimensions
    and collapses the rate — the reference protocol only whitens AFTER
    bin normalization, and so must any caller here."""
    from mapping_private_tpu.classify.evaluate import leave_one_out_subspace

    _, Fr, L, names = corpus
    r = leave_one_out_subspace(Fr, L, names, "r", whiten=True)
    assert r.rate < 0.5, r.rate

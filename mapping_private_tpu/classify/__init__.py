from mapping_private_tpu.classify.libsvm import (
    SVMModel,
    load_libsvm_model,
    load_scale_params,
    scale_features,
    svm_decision_values,
    svm_predict_batch,
)
from mapping_private_tpu.classify.subspace import (
    SubspaceClassifier,
    train_subspaces,
    classify_subspace,
)
from mapping_private_tpu.classify.linear import train_linear_svm, predict_linear

__all__ = [
    "SVMModel",
    "load_libsvm_model",
    "load_scale_params",
    "scale_features",
    "svm_decision_values",
    "svm_predict_batch",
    "SubspaceClassifier",
    "train_subspaces",
    "classify_subspace",
    "train_linear_svm",
    "predict_linear",
]

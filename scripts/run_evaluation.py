"""One-off: the reference-protocol 63-object evaluation (leave-one-out
subspace per 2.leave_one_out.sh + kernel-SVM cross-validation) over the
features extracted by scripts/extract_corpus.py.  Writes EVALUATION.md
and EVALUATION.json at the repo root."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
from mapping_private_tpu.classify.evaluate import (
    extract_corpus_features_all, leave_one_out_subspace, crossval_svm)

F, L, names = extract_corpus_features_all(
    cache_path="/root/repo/data_cache/corpus_features.npz")
print({t: F[t].shape for t in F})
results = {}
for t in "cdgr":
    t0 = time.time()
    r = leave_one_out_subspace(F[t], L, names, t)
    results[f"subspace_{t}"] = dict(
        rate=round(r.rate, 4), correct=r.n_correct, total=r.n_total,
        seconds=round(time.time()-t0, 1))
    print(t, results[f"subspace_{t}"], flush=True)
for t in "gr":
    t0 = time.time()
    r = crossval_svm(F[t], L, names, n_folds=4)
    results[f"svm4fold_{t}"] = dict(
        rate=round(r.rate, 4), correct=r.n_correct, total=r.n_total,
        seconds=round(time.time()-t0, 1))
    print("svm", t, results[f"svm4fold_{t}"], flush=True)

with open("/root/repo/EVALUATION.json", "w") as fp:
    json.dump(dict(protocol="63 objects x 24 views; leave-one-out per "
                   "2.leave_one_out.sh (fold-retrained own subspace, "
                   "others full); SVM = view-held-out 4-fold with the "
                   "kernel OvO trainer", results=results), fp, indent=1)
print("wrote EVALUATION.json")

"""TRAIN-side subspace-method oracle (round-4 verdict item 4).

The headline leave-one-out subspace rates were anchored only by our own
reading of the reference.  Here the reference's ACTUAL training and
classification code — color_voxel_recognition/src/pca.cpp (the PCA class
with its f32 correlation accumulation, solve, file IO) plus the
`computeSubspace`, `compressFeature`, `my_clock` and
`classify_by_subspace` functions extracted verbatim at test time from
computeSubspace_from_file.cpp / test_classify_from_file.cpp — is
compiled into a train+classify driver (Eigen headers come from the
environment's cached tensorflow include tree).  Both sides train on the
same committed corpus features and classify the same held-out views;
per-sample prediction agreement and held-out rates are gated, anchoring
EVALUATION.md's subspace column the way test_svm_train_oracle.py anchors
the SVM column.
"""
import glob
import os
import shutil
import subprocess

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data_corpus_features_gr.npz")
CVR = "/root/reference/color_voxel_recognition"
CFC_TEST = "/root/reference/color_feature_classification/test"
N_CLASSES = 12


def _find_eigen():
    hits = glob.glob("/usr/include/eigen3/Eigen/Eigenvalues") + glob.glob(
        "/root/.cache/uv/archive-v0/*/tensorflow/include/Eigen/Eigenvalues")
    if not hits:
        pytest.skip("no Eigen headers available")
    return os.path.dirname(os.path.dirname(hits[0]))


def _extract_function(src: str, marker: str) -> str:
    """Slice one function out of reference source text by brace counting
    from its signature marker."""
    start = src.index(marker)
    i = src.index("{", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[start : j + 1]
    raise ValueError(f"unbalanced braces after {marker!r}")


DRIVER_MAIN = r"""
int main(int argc, char** argv) {
  // argv: out_file tmp_root n_class sub_dim compress_dim
  const char* out_file = argv[1];
  const char* root = argv[2];
  const int n_class = atoi(argv[3]);
  const int sub_dim = atoi(argv[4]);
  const int compress_dim = atoi(argv[5]);
  char buf[4096];
  snprintf(buf, sizeof buf, "%s/data", root); mkdir(buf, 0777);
  for (int c = 0; c < n_class; c++) {
    snprintf(buf, sizeof buf, "%s/data/obj%03d", root, c); mkdir(buf, 0777);
  }
  snprintf(buf, sizeof buf, "%s/pca_result_g", root); mkdir(buf, 0777);

  int n_train, d;
  if (scanf("%d %d", &n_train, &d) != 2) return 1;
  std::vector< std::vector<float> > all(n_train);
  std::vector<int> labels(n_train);
  for (int i = 0; i < n_train; i++) {
    if (scanf("%d", &labels[i]) != 1) return 1;
    all[i].resize(d);
    for (int t = 0; t < d; t++)
      if (scanf("%f", &all[i][t]) != 1) return 1;
  }
  std::string axis_file = std::string(root) + "/compress_axis";
  if (compress_dim > 0) {
    std::vector< std::vector<float> > copy = all;
    computeSubspace(copy, axis_file.c_str(), false);
    compressFeature(axis_file, all, compress_dim, false);
  }
  for (int c = 0; c < n_class; c++) {
    std::vector< std::vector<float> > cls;
    for (int i = 0; i < n_train; i++)
      if (labels[i] == c) cls.push_back(all[i]);
    snprintf(buf, sizeof buf, "%s/pca_result_g/%03d", root, c);
    computeSubspace(cls, buf, false);
  }
  int n_test, d2;
  if (scanf("%d %d", &n_test, &d2) != 2) return 1;
  FILE* out = fopen(out_file, "w");
  for (int i = 0; i < n_test; i++) {
    std::vector<float> f(d2);
    for (int t = 0; t < d2; t++)
      if (scanf("%f", &f[t]) != 1) return 1;
    if (compress_dim > 0)
      compressFeature(axis_file, f, compress_dim, false);
    int cls = classify_by_subspace(f, 'g', sub_dim, root);
    fprintf(out, "%d\n", cls);
  }
  fclose(out);
  return 0;
}
"""


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    eigen = _find_eigen()
    with open(os.path.join(CFC_TEST, "test_classify_from_file.cpp")) as f:
        classify_src = f.read()
    with open(os.path.join(CFC_TEST, "computeSubspace_from_file.cpp")) as f:
        train_src = f.read()
    parts = [
        "#include <cstdio>\n#include <cstdlib>\n#include <cstring>\n"
        "#include <cfloat>\n#include <cmath>\n#include <vector>\n"
        "#include <string>\n#include <iostream>\n#include <dirent.h>\n"
        "#include <sys/stat.h>\n#include <sys/time.h>\n"
        '#include "color_voxel_recognition/pca.h"\n#include "FILE_MODE"\n'
        "#define ROS_ERROR(...) fprintf(stderr, __VA_ARGS__)\n"
        "using namespace std;\n",
        _extract_function(classify_src, "double my_clock"),
        _extract_function(classify_src, "int classify_by_subspace"),
        # single-feature (classifier) and batch (trainer) overloads
        _extract_function(classify_src, "void compressFeature"),
        _extract_function(train_src, "void compressFeature"),
        _extract_function(train_src, "void computeSubspace"),
        DRIVER_MAIN,
    ]
    tmp = tmp_path_factory.mktemp("subspace_oracle")
    src_path = tmp / "driver.cpp"
    src_path.write_text("\n".join(parts))
    exe = str(tmp / "subspace_oracle")
    r = subprocess.run(
        ["g++", "-O2", "-w", f"-I{eigen}", f"-I{CVR}/include",
         f"-I{CFC_TEST}", str(src_path), f"{CVR}/src/pca.cpp", "-o", exe],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:400]}")
    return exe


@pytest.fixture(scope="module")
def corpus():
    z = np.load(DATA, allow_pickle=True)
    return z["features_g"], z["features_r"], z["labels"]


def _split(F, L):
    """View-fold split: every 4th view held out (the svm-oracle split)."""
    V = np.max(np.bincount(L))
    vidx = np.arange(len(L)) % V
    te = vidx % 4 == 0
    return F[~te], L[~te], F[te], L[te]


def _run_oracle(exe, tmp_path, Xtr, Ltr, Xte, n_class, sub_dim,
                compress_dim):
    lines = [f"{len(Xtr)} {Xtr.shape[1]}"]
    for lab, row in zip(Ltr, Xtr):
        lines.append(str(int(lab)) + " " +
                     " ".join(f"{v:.9g}" for v in row))
    lines.append(f"{len(Xte)} {Xte.shape[1]}")
    for row in Xte:
        lines.append(" ".join(f"{v:.9g}" for v in row))
    out_file = str(tmp_path / "preds.txt")
    root = str(tmp_path / "root")
    os.makedirs(root, exist_ok=True)
    r = subprocess.run(
        [exe, out_file, root, str(n_class), str(sub_dim),
         str(compress_dim)],
        input="\n".join(lines), capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-300:])
    return np.loadtxt(out_file, dtype=int)


def _compare(exe, tmp_path, F, L, sub_dim, compress_dim,
             bin_normalize=False):
    from mapping_private_tpu.classify.evaluate import subspace_split_protocol

    keep = L < N_CLASSES
    Xtr, Ltr, Xte, Lte = _split(F[keep].astype(np.float32), L[keep])
    if bin_normalize:
        # the protocol's 0.calcNormalization step (scaling() in both
        # reference tools: f -> upper * f / fmax over the TRAINING max)
        # — identical input prep on both sides
        mx = np.maximum(Xtr.max(0), 1e-12).astype(np.float32)
        Xtr, Xte = Xtr / mx, Xte / mx
    ref = _run_oracle(exe, tmp_path, Xtr, Ltr, Xte, N_CLASSES, sub_dim,
                      compress_dim or 0)
    ours, _ = subspace_split_protocol(
        Xtr, Ltr, Xte, N_CLASSES, sub_dim, compress_dim, whiten=True)
    agree = float((ours == ref).mean())
    rate_ref = float((ref == Lte).mean())
    rate_ours = float((ours == Lte).mean())
    assert rate_ref > 2.0 / N_CLASSES, "oracle rate at chance — bad wiring"
    return agree, rate_ref, rate_ours


class TestSubspaceTrainOracle:
    def test_g_direct(self, oracle, corpus, tmp_path):
        """GRSD-20 features, no compression: the subspace core alone."""
        Fg, _, L = corpus
        agree, r_ref, r_ours = _compare(oracle, tmp_path, Fg, L,
                                        sub_dim=10, compress_dim=None)
        assert agree >= 0.98, f"per-sample agreement {agree:.3%}"
        assert abs(r_ref - r_ours) <= 0.02, (r_ref, r_ours)

    def test_r_compressed_whitened(self, oracle, corpus, tmp_path):
        """VOSCH-137 with the full option chain: bin normalization
        (0.calcNormalization), -dim compression, FILE_MODE WHITENING,
        then per-class subspaces.  Dims are held inside the ranks this
        12-class subset supports: compress_dim 30 keeps the compress
        eigenvalues ~65x above the reference's own MatrixXf noise floor
        (its f32 arithmetic NaNs out at the full protocol's -dim 100 on
        a corpus this small — whitening hits sqrt of noise-negative
        eigenvalues), and sub_dim 12 stays below the 18-row per-class
        rank (past it, both implementations pad the basis with
        ARBITRARY null-space directions and per-sample agreement is
        meaningless by construction)."""
        _, Fr, L = corpus
        agree, r_ref, r_ours = _compare(oracle, tmp_path, Fr, L,
                                        sub_dim=12, compress_dim=30,
                                        bin_normalize=True)
        assert agree >= 0.98, f"per-sample agreement {agree:.3%}"
        assert abs(r_ref - r_ours) <= 0.02, (r_ref, r_ours)

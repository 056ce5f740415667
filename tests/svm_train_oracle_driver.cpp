// Test-time TRAINING oracle: trains the REFERENCE's own vendored libsvm
// fork (color_feature_classification/src/libsvm_and_linear/libsvm_asako/
// libSVM.cpp — svm_train, Solver::Solve SMO) on a dense training file and
// prints, per test line, the predicted label followed by all
// nr_class*(nr_class-1)/2 one-vs-one decision values.  This anchors
// classify/train_svm.py's SMO against the reference's actual TRAINING
// computation (round-3 verdict item 3), not just its prediction path.
//
//   g++ -O2 -I<libsvm_asako dir> svm_train_oracle_driver.cpp <dir>/libSVM.cpp
//   ./a.out train.txt C gamma < test_feature_lines
//
// train.txt: one sample per line, "label f1 f2 ... fD" (dense).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "libSVM.hpp"

void svm_print_string_stdout(const char* s) { (void)s; /* silence */ }

static bool parse_dense(char* line, double* label, std::vector<double>* f) {
  char* tok = strtok(line, " \t\n");
  if (!tok) return false;
  *label = atof(tok);
  f->clear();
  for (tok = strtok(NULL, " \t\n"); tok; tok = strtok(NULL, " \t\n"))
    f->push_back(atof(tok));
  return !f->empty();
}

int main(int argc, char** argv) {
  if (argc != 4) {
    fprintf(stderr, "usage: %s train.txt C gamma < test_lines\n", argv[0]);
    return 1;
  }
  FILE* tf = fopen(argv[1], "r");
  if (!tf) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  std::vector<double> labels;
  std::vector<std::vector<double> > rows;
  char line[1 << 16];
  while (fgets(line, sizeof line, tf)) {
    double y;
    std::vector<double> f;
    if (parse_dense(line, &y, &f)) {
      labels.push_back(y);
      rows.push_back(f);
    }
  }
  fclose(tf);
  if (rows.empty()) return 3;

  // dense rows → libsvm sparse nodes (1-based indices, -1 terminator)
  size_t n = rows.size(), d = rows[0].size();
  std::vector<svm_node> pool(n * (d + 1));
  std::vector<svm_node*> x(n);
  for (size_t i = 0; i < n; i++) {
    svm_node* p = &pool[i * (d + 1)];
    x[i] = p;
    for (size_t j = 0; j < d; j++) {
      p[j].index = (int)j + 1;
      p[j].value = rows[i][j];
    }
    p[d].index = -1;
    p[d].value = 0.0;
  }
  svm_problem prob;
  prob.l = (int)n;
  prob.y = &labels[0];
  prob.x = &x[0];

  svm_parameter param;
  memset(&param, 0, sizeof param);
  param.svm_type = C_SVC;
  param.kernel_type = RBF;
  param.C = atof(argv[2]);
  param.gamma = atof(argv[3]);
  param.eps = 1e-3;        // libsvm default stopping tolerance
  param.cache_size = 200;  // MB
  param.shrinking = 1;
  param.degree = 3;
  param.coef0 = 0;
  param.nu = 0.5;
  param.p = 0.1;

  const char* err = svm_check_parameter(&prob, &param);
  if (err) {
    fprintf(stderr, "param error: %s\n", err);
    return 4;
  }
  svm_model* model = svm_train(&prob, &param);
  int nc = svm_get_nr_class(model);
  int np_ = nc * (nc - 1) / 2;
  std::vector<int> lab(nc);
  svm_get_labels(model, &lab[0]);
  // print the model's class-label order so the caller can map pair
  // ordering ((0,1),(0,2),...) onto its own class ids
  printf("labels");
  for (int c = 0; c < nc; c++) printf(" %d", lab[c]);
  printf("\n");

  std::vector<double> dec(np_);
  std::vector<svm_node> nodes(d + 1);
  while (fgets(line, sizeof line, stdin)) {
    double dummy;
    std::vector<double> f;
    // test lines are features only
    char* tok = strtok(line, " \t\n");
    f.clear();
    for (; tok; tok = strtok(NULL, " \t\n")) f.push_back(atof(tok));
    (void)dummy;
    if (f.empty()) continue;
    for (size_t j = 0; j < f.size(); j++) {
      nodes[j].index = (int)j + 1;
      nodes[j].value = f[j];
    }
    nodes[f.size()].index = -1;
    // this fork's svm_predict_values returns void; svm_predict re-runs
    // the vote internally
    svm_predict_values(model, &nodes[0], &dec[0]);
    double pred = svm_predict(model, &nodes[0]);
    printf("%g", pred);
    for (int p = 0; p < np_; p++) printf(" %.10g", dec[p]);
    printf("\n");
  }
  svm_destroy_model(model);
  return 0;
}

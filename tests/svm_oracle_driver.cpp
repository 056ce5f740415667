// Test-time oracle driver: compiles against the REFERENCE's own vendored
// libsvm fork (color_feature_classification/src/libsvm_and_linear/
// libsvm_asako/libSVM.cpp) so our batched predictor is checked against the
// reference's actual computation, not our reading of it.
//
//   g++ -O2 -I<libsvm_asako dir> svm_oracle_driver.cpp <dir>/libSVM.cpp
//   ./a.out model.file < "f1 f2 ... fD" lines > predicted labels
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "libSVM.hpp"

// libSVM.cpp declares its print hook extern; SVM.cpp (which needs a heavy
// coolVisi dependency) normally provides it — supply it here instead.
void svm_print_string_stdout(const char* s) { fputs(s, stdout); }

int main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s model_file < feature_lines\n", argv[0]);
    return 1;
  }
  svm_model* model = svm_load_model(argv[1]);
  if (!model) {
    fprintf(stderr, "cannot load %s\n", argv[1]);
    return 2;
  }
  char line[1 << 16];
  while (fgets(line, sizeof line, stdin)) {
    std::vector<svm_node> nodes;
    int idx = 1;
    for (char* tok = strtok(line, " \t\n"); tok; tok = strtok(NULL, " \t\n")) {
      svm_node n;
      n.index = idx++;
      n.value = atof(tok);
      nodes.push_back(n);
    }
    if (nodes.empty()) continue;
    svm_node end;
    end.index = -1;
    end.value = 0.0;
    nodes.push_back(end);
    printf("%g\n", svm_predict(model, nodes.data()));
  }
  return 0;
}

// Example native model for pigeons_tpu.models.native.NativeTarget:
// heterogeneous-precision Gaussian (the reference's
// HetPrecisionNormalLogPotential test fixture) with analytic gradient.
//
// Build:  g++ -O3 -shared -fPIC het_normal.cpp -o het_normal.so
// Run:    pigeons(target=NativeTarget("het_normal.so"))
//
// ABI contract: see pigeons_tpu/models/native.py.

#include <cmath>

namespace {
constexpr int kDim = 4;
// precisions 500, 167, 56, 1 (log-spaced), like the reference fixture's
// ill-conditioned diagonal
const double kPrec[kDim] = {500.0, 167.0, 56.0, 1.0};
}  // namespace

extern "C" {

int ptn_dim() { return kDim; }

double ptn_log_density(const double* x, int dim) {
  double lp = 0.0;
  for (int i = 0; i < dim; ++i) lp -= 0.5 * kPrec[i] * x[i] * x[i];
  return lp;
}

double ptn_log_density_gradient(const double* x, int dim, double* grad) {
  double lp = 0.0;
  for (int i = 0; i < dim; ++i) {
    lp -= 0.5 * kPrec[i] * x[i] * x[i];
    grad[i] = -kPrec[i] * x[i];
  }
  return lp;
}

// batched fast path: one call per vmapped replica batch
void ptn_log_density_batch(const double* x, int batch, int dim, double* out) {
  for (int b = 0; b < batch; ++b) out[b] = ptn_log_density(x + b * dim, dim);
}

}  // extern "C"

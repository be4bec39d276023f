// Compiled stream-protocol worker: the C++ side of the Pigeons stream
// bridge (reference src/targets/StreamTarget.jl:16-23 — the same
// stdin/stdout text protocol the Julia reference speaks to JVM processes).
//
// Implements the scaled-precision Gaussian path of toy_mvn_target
// (precision interpolating precision0 -> precision1), so end-to-end runs
// through the bridge can be checked against the analytic oracles exactly
// like the pure-Python demo worker (pigeons_tpu/models/stream_worker_demo.py).
//
// Protocol, one command per line on stdin:
//   log_potential(<beta>)  -> "response(<joint log density>)"
//   call_sampler!(<beta>)  -> one sweep of local exploration, "response()"
// Any informational noise printed before/between responses must be
// tolerated by the bridge (expect-style scanning) — we emit a banner to
// exercise that.
//
// Build: g++ -O2 -std=c++17 -o stream_worker stream_worker.cpp
// Run:   ./stream_worker --seed 7 --dim 2

#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

int main(int argc, char** argv) {
  long seed = 1;
  int dim = 2;
  double precision0 = 1.0, precision1 = 10.0;
  bool iid = false;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "--seed") && i + 1 < argc) seed = atol(argv[++i]);
    else if (!strcmp(argv[i], "--dim") && i + 1 < argc) dim = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--precision0") && i + 1 < argc) precision0 = atof(argv[++i]);
    else if (!strcmp(argv[i], "--precision1") && i + 1 < argc) precision1 = atof(argv[++i]);
    else if (!strcmp(argv[i], "--iid")) iid = true;
  }

  std::mt19937_64 rng(static_cast<unsigned long long>(seed));
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::uniform_real_distribution<double> unif(0.0, 1.0);

  std::vector<double> x(dim);
  for (auto& v : x) v = gauss(rng);

  auto precision = [&](double beta) {
    return (1.0 - beta) * precision0 + beta * precision1;
  };
  auto log_potential = [&](double beta) {
    double ss = 0.0;
    for (double v : x) ss += v * v;
    return -0.5 * precision(beta) * ss;
  };
  auto call_sampler = [&](double beta) {
    double prec = precision(beta);
    if (iid || beta == 0.0) {
      double sd = 1.0 / std::sqrt(prec);
      for (auto& v : x) v = sd * gauss(rng);
      return;
    }
    // random-walk Metropolis sweep (same shape as the demo worker)
    double step = 1.0 / std::sqrt(prec);
    for (int pass = 0; pass < 10; pass++) {
      double lp0 = log_potential(beta);
      std::vector<double> prop(dim);
      double ss = 0.0;
      for (int j = 0; j < dim; j++) {
        prop[j] = x[j] + step * gauss(rng);
        ss += prop[j] * prop[j];
      }
      double lp1 = -0.5 * prec * ss;
      if (std::log(unif(rng) + 1e-300) < lp1 - lp0) x = prop;
    }
  };

  // informational noise the bridge must skip over
  printf("c++ stream worker ready (dim=%d seed=%ld)\n", dim, seed);
  fflush(stdout);

  char buf[4096];
  while (fgets(buf, sizeof buf, stdin)) {
    std::string line(buf);
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (line.empty()) continue;
    const std::string lp_pre = "log_potential(";
    const std::string cs_pre = "call_sampler!(";
    if (line.rfind(lp_pre, 0) == 0 && line.back() == ')') {
      double beta = atof(line.substr(lp_pre.size(), line.size() - lp_pre.size() - 1).c_str());
      printf("response(%.17g)\n", log_potential(beta));
    } else if (line.rfind(cs_pre, 0) == 0 && line.back() == ')') {
      double beta = atof(line.substr(cs_pre.size(), line.size() - cs_pre.size() - 1).c_str());
      call_sampler(beta);
      printf("response()\n");
    } else {
      printf("response(nan)\n");
    }
    fflush(stdout);
  }
  return 0;
}

"""A hierarchical varying-slopes regression with a Cholesky-LKJ prior,
written in plain Stan and sampled with AutoMALA.

This is the bread-and-butter of applied Stan — a covariance-matrix
parameter (`cholesky_factor_corr` + scale vector), matrix algebra
(`diag_pre_multiply`, transposes, integer-array row gathers), and the LKJ
prior with its exact normalizer — all compiled by the Stan front end to one
traced JAX density that the runtime vmaps across every chain and ladder
(the reference reaches this language through BridgeStan's C++,
`ext/PigeonsBridgeStanExt/interface.jl:120-183`).

Run:  python examples/stan_hierarchical.py
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pigeons_tpu import pigeons, stan_target

MODEL = """
data {
  int<lower=0> N;
  int<lower=1> J;
  int<lower=1> P;
  array[N] int<lower=1, upper=J> g;
  matrix[N, P] x;
  vector[N] y;
}
parameters {
  matrix[P, J] z;
  cholesky_factor_corr[P] L_Omega;
  vector<lower=0>[P] tau;
  real<lower=0> sigma;
}
transformed parameters {
  matrix[J, P] beta = (diag_pre_multiply(tau, L_Omega) * z)';
}
model {
  to_vector(z) ~ std_normal();
  L_Omega ~ lkj_corr_cholesky(2);
  tau ~ cauchy(0, 2.5);
  sigma ~ exponential(1);
  y ~ normal(rows_dot_product(beta[g], x), sigma);
}
"""


def main():
    rng = np.random.default_rng(0)
    N, J, P = 160, 4, 2
    x = rng.normal(size=(N, P))
    g = rng.integers(1, J + 1, size=N)
    beta_true = rng.normal(size=(J, P))
    y = np.sum(beta_true[g - 1] * x, axis=1) + 0.3 * rng.normal(size=N)

    target = stan_target(
        source=MODEL,
        data={"N": N, "J": J, "P": P, "g": g, "x": x, "y": y},
        name="varying_slopes",
    )
    pt = pigeons(target=target, n_chains=8, n_rounds=10, seed=1)

    draws = target.constrained_samples(pt)  # params + transformed params
    beta_hat = draws["beta"].mean(axis=0)
    print("\nposterior-mean slopes vs truth (per group):")
    for j in range(J):
        print(f"  group {j + 1}: {beta_hat[j].round(2)}  "
              f"(true {beta_true[j].round(2)})")
    corr = draws["L_Omega"] @ np.swapaxes(draws["L_Omega"], 1, 2)
    print(f"posterior-mean slope correlation: {corr.mean(axis=0)[0, 1]:.2f}")
    print(f"logZ estimate: {pt.reports[-1].log_z_estimate:.2f}")


if __name__ == "__main__":
    main()

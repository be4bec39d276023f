"""Run a reference Stan model file unchanged.

`stan_target` compiles the Stan language to a traced, differentiable JAX
density (BridgeStan conventions: propto=false, constraint jacobians,
AutoMALA as the default explorer) and extracts constrained draws including
transformed parameters and generated quantities — the analogue of the
reference's BridgeStan pipeline (`ext/PigeonsBridgeStanExt`).

Run:  python examples/stan_model.py [path/to/model.stan path/to/data.json]
Without arguments it uses an inline eight-schools model.
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pigeons_tpu import pigeons, stan_target

EIGHT_SCHOOLS = """
data {
  int<lower=0> J;
  array[J] real y;
  array[J] real<lower=0> sigma;
}
parameters {
  vector[J] theta_trans;
  real mu;
  real<lower=0> tau;
}
transformed parameters {
  vector[J] theta;
  theta = theta_trans * tau + mu;
}
model {
  theta_trans ~ normal(0, 1);
  y ~ normal(theta, sigma);
  mu ~ normal(0, 5);
  tau ~ cauchy(0, 5);
}
"""
DATA = {"J": 8, "y": [28, 8, -3, 7, -1, 1, 18, 12],
        "sigma": [15, 10, 16, 11, 9, 11, 10, 18]}

if len(sys.argv) == 3:
    target = stan_target(file=sys.argv[1], data=sys.argv[2])
else:
    target = stan_target(source=EIGHT_SCHOOLS, data=DATA)

pt = pigeons(target=target, n_chains=8, n_rounds=9, seed=1)
q = target.constrained_samples(pt)
print("\nsample names:", target.sample_names()[:4], "...")
print("posterior mean mu  =", float(q["mu"].mean()))
print("posterior mean tau =", float(q["tau"].mean()))
print("theta (transformed parameter) shape:", q["theta"].shape)
print("logZ =", pt.reports[-1].log_z_estimate)

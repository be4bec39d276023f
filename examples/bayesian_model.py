"""Bayesian models with the constrained-parameter DSL.

The analogue of the reference's Turing/Stan frontends: declare priors on the
natural support (positivity, intervals — bijectors and Jacobians are
automatic), give a traced log likelihood, and sample. The prior doubles as
the iid-sampleable reference distribution of the tempered path.

Run:  python examples/bayesian_model.py
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pigeons_tpu import pigeons, summary
from pigeons_tpu.models import eight_schools

# the classic eight-schools hierarchical model (non-centered), as shipped in
# the model library; see BayesianModel for writing your own:
#
#   model = BayesianModel(
#       priors={"mu": Normal(scale=5.0), "tau": HalfCauchy(scale=2.5),
#               "theta_trans": Normal(shape=(8,))},
#       log_likelihood=lambda q: normal_logpdf(
#           y, q["mu"] + q["theta_trans"] * q["tau"], sigma),
#   )
target = eight_schools()

pt = pigeons(target=target, n_chains=10, n_rounds=9, seed=1)

# per-parameter posterior summary (mean/std/ESS/split-Rhat), on the
# CONSTRAINED scale — the analogue of MCMCChains' summarystats
print(summary(pt))

q = target.constrained_samples(pt)
print("\nP(mu > 0) =", float(np.mean(q["mu"] > 0.0)))
print("posterior mean tau =", float(q["tau"].mean()))

"""Quickstart: 10-chain NRPT on the d=100 toy multivariate Gaussian.

The minimal run, mirroring the reference's front-page example
(Pigeons.jl docs/src/index.md): sample, read posterior moments, the
stepping-stone log-normalization estimate, and the global communication
barrier — all with analytic oracles on this toy path.

Run:  python examples/quickstart.py
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pigeons_tpu import pigeons, toy_mvn_target

pt = pigeons(target=toy_mvn_target(100), n_chains=10, n_rounds=9, seed=1)

print("posterior mean (first 3, expect ~0):   ", pt.mean()[:3])
print("posterior var  (first 3, expect ~0.1): ", pt.var()[:3])
print("logZ estimate:  %.2f   analytic: %.2f"
      % (pt.reports[-1].log_z_estimate, pt.path.analytic_lognormalization()))
print("global barrier: %.2f   analytic: %.2f"
      % (pt.global_barrier, pt.path.analytic_cumulative_barrier(1.0)))
print("tempered restarts:", pt.n_tempered_restarts)

# the target-chain trace: [n_scans, dim + 1] (last column = log density)
samples = pt.sample_array()
print("trace shape:", samples.shape)

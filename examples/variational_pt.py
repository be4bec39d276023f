"""Stabilized variational PT: the two-leg ladder.

A Gaussian variational reference is moment-fit to the target between rounds
and anchors a second leg of chains; both legs end at the target, and tempered
restarts can regenerate from the fitted reference once it activates. On
well-conditioned targets the variational leg's communication barrier
collapses to ~0, multiplying the restart rate (Surjanovic et al. 2022;
reference: GaussianReference.jl, test_variational.jl).

Run:  python examples/variational_pt.py
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pigeons_tpu import GaussianReference, Inputs, PT, toy_mvn_target

pt = PT(
    Inputs(
        target=toy_mvn_target(20),
        n_chains=5,                # fixed leg (prior reference)
        n_chains_variational=5,    # variational leg (fitted reference)
        n_rounds=10,
        seed=1,
        variational=GaussianReference(first_tuning_round=6),
    )
)
pt.run()

print("fixed-leg barrier:       %.3f" % pt.global_barrier)
print("variational-leg barrier: %.3f  (collapses once fit)"
      % pt.global_barrier_variational)
print("tempered restarts:", pt.n_tempered_restarts)
print("posterior mean[:3]:", pt.mean()[:3])

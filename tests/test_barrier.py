"""Communication-barrier estimation vs the Predescu et al. closed form
(reference ``test/test_cumulative_barrier.jl``: |estimate - truth| < 0.01 on a
beta grid after 15 rounds with the slice sampler)."""

import pytest
import numpy as np

import pigeons_tpu as pg


@pytest.mark.slow
def test_cumulative_barrier_matches_analytic():
    # 4 pooled replicate ladders halve the MC error of the rejection profile
    # (reference test/test_cumulative_barrier.jl runs 15 rounds for |err|<0.01)
    target = pg.toy_mvn_target(2)
    pt = pg.pigeons(
        target=target,
        explorer=pg.SliceSampler(),
        n_rounds=14,
        n_replicates=4,
        show_report=False,
    )
    path = pg.toy_mvn_path(2)
    betas = np.arange(0.0, 1.01, 0.1)
    est = pt.barriers.cumulative_barrier(betas)
    truth = path.analytic_cumulative_barrier(betas)
    assert np.all(np.abs(est - truth) < 0.015)

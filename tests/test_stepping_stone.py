"""Normalization-constant estimation vs the analytic oracle
(reference ``test/test_stepping_stone.jl``: |logZhat - logZ| < 0.2 for both
directions of the sandwich, d=10 MVN, 6 chains, 12 rounds)."""

import numpy as np
import pytest

import pigeons_tpu as pg


@pytest.mark.slow
@pytest.mark.parametrize("explorer_name", ["toy", "slice"])
def test_stepping_stone_one_leg(explorer_name):
    explorer = pg.SliceSampler() if explorer_name == "slice" else None
    pt = pg.pigeons(
        target=pg.toy_mvn_target(10),
        explorer=explorer,
        n_chains=6,
        n_rounds=12,
        n_replicates=4,
        show_report=False,
    )
    truth = pg.toy_mvn_path(10).analytic_lognormalization()
    p = pg.stepping_stone_pair(pt)
    assert abs(p[0] - truth) < 0.2
    assert abs(p[1] - truth) < 0.2
    assert abs(pg.stepping_stone(pt) - truth) < 0.2

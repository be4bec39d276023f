"""Stabilized variational PT tests (reference test/test_variational.jl,
test/test_two_legs.jl)."""

import pytest
import numpy as np

from pigeons_tpu import (
    GaussianReference,
    Inputs,
    PT,
    SliceSampler,
    TestSwapper,
    toy_mvn_target,
)


@pytest.mark.slow
def test_two_leg_restart_gain():
    """2-leg PT restarts ~2x the single-leg count with a constant swapper
    (reference test_variational.jl:43-53: TestSwapper(0.5), 5+5 chains)."""

    def restarts(n_fixed, n_var, rounds=12):
        pt = PT(
            Inputs(
                target=TestSwapper(0.5),
                n_chains=n_fixed,
                n_chains_variational=n_var,
                n_rounds=rounds,
                seed=1,
                show_report=False,
            )
        )
        pt.run()
        return pt.n_tempered_restarts

    one_leg = restarts(5, 0)
    two_leg = restarts(5, 5)
    assert one_leg > 0
    np.testing.assert_allclose(two_leg / one_leg, 2.0, rtol=0.12)


def test_variational_barrier_collapses():
    """Lambda_var -> ~0 once the Gaussian reference fits a Gaussian target
    (reference test_variational.jl:96-100: <= 0.05 after 13 rounds)."""
    pt = PT(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=5,
            n_chains_variational=5,
            n_rounds=10,
            seed=1,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
        )
    )
    pt.run()
    assert pt.global_barrier_variational <= 0.06
    assert pt.global_barrier > 0.5  # fixed leg barrier unaffected
    np.testing.assert_allclose(pt.mean(), 0.0, atol=0.03)
    np.testing.assert_allclose(pt.var(), 0.1, atol=0.03)


def test_two_leg_absolute_log_z():
    """With a NORMALIZED variational reference, the variational-leg stepping
    stone estimates the absolute log Z of the unnormalized target:
    log integral exp(-5|x|^2) dx = (d/2) log(2 pi / 10)."""
    d = 3
    pt = PT(
        Inputs(
            target=toy_mvn_target(d),
            n_chains=4,
            n_chains_variational=4,
            n_rounds=10,
            seed=2,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
        )
    )
    pt.run()
    expected = 0.5 * d * np.log(2.0 * np.pi / 10.0)
    assert abs(pt.reports[-1].log_z_estimate - expected) < 0.2


def test_variational_activation_round():
    """No activation before first_tuning_round (reference GaussianReference.jl:17-20)."""
    pt = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=3,
            n_chains_variational=3,
            n_rounds=4,
            seed=1,
            variational=GaussianReference(first_tuning_round=6),
            show_report=False,
        )
    )
    pt.run()
    assert float(pt._ref_params["active"]) == 0.0
    pt.run_round()
    pt.run_round()
    assert float(pt._ref_params["active"]) == 1.0


def test_single_leg_variational():
    """n_chains_variational > 0 with n_chains = 0 gives one leg whose
    reference becomes the fitted Gaussian (reference tempering.jl:65-70)."""
    pt = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=0,
            n_chains_variational=5,
            n_rounds=8,
            seed=1,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
        )
    )
    pt.run()
    assert float(pt._ref_params["active"]) == 1.0
    np.testing.assert_allclose(pt.var(), 0.1, atol=0.04)
    # barrier to the (now variational) reference collapses too
    assert pt.global_barrier < 0.5

"""Two frontends, one model, matching answers — the analogue of the
reference's ``test/test_turing_stan_agree.jl`` (the same model written for
two different frontends must produce agreeing posteriors and normalization
constants).

Here the unid model (``examples/stan/unid.stan``) is expressed twice:
  * through the constrained-parameter DSL (``BayesianModel`` — the Turing/
    Stan-frontend analogue, with automatic bijectors + Jacobians), and
  * as a hand-written raw ``Target`` over the unconstrained space (the
    "custom log potential" route), with the logit transform and its Jacobian
    written out manually.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pigeons_tpu import Inputs, PT
from pigeons_tpu.models import unid_analytic_log_z, unid_target
from pigeons_tpu.models.distributions import binomial_logpmf
from pigeons_tpu.models.target import Reference, Target

N_TRIALS, N_SUCC = 100, 50


class HandWrittenUnid(Target):
    """unid in unconstrained coordinates q = logit(p), hand-written:
    log p(q) = log Binom(s | n, p1 p2) + sum_i log |d p_i / d q_i|
    (the U(0,1) prior density is 1)."""

    dim = 2

    def log_density(self, q):
        p = 1.0 / (1.0 + jnp.exp(-q))
        # logistic Jacobian: log sigma'(q) = log p + log(1 - p)
        log_jac = jnp.sum(jnp.log(p) + jnp.log1p(-p))
        return binomial_logpmf(float(N_SUCC), float(N_TRIALS), p[0] * p[1]) + log_jac

    def default_reference(self) -> Reference:
        def sample_iid(key):
            # prior draw: p ~ U(0,1) -> q = logit(p)
            u = jax.random.uniform(key, (2,), minval=1e-6, maxval=1 - 1e-6)
            return jnp.log(u) - jnp.log1p(-u)

        def ref_log_density(q):
            p = 1.0 / (1.0 + jnp.exp(-q))
            return jnp.sum(jnp.log(p) + jnp.log1p(-p))

        return Reference(log_density=ref_log_density, sample_iid=sample_iid)


def _run(target, seed):
    pt = PT(
        Inputs(
            target=target,
            n_chains=6,
            n_rounds=10,
            seed=seed,
            show_report=False,
        )
    )
    pt.run()
    return pt


@pytest.mark.slow
def test_dsl_and_handwritten_unid_agree():
    logz = unid_analytic_log_z(N_TRIALS, N_SUCC)
    pt_dsl = _run(unid_target(N_TRIALS, N_SUCC), seed=1)
    pt_raw = _run(HandWrittenUnid(), seed=2)

    # both match the exact normalization constant (reference
    # test_stepping_stone.jl tolerance 0.2 on |logZhat - logZ|)
    assert abs(pt_dsl.reports[-1].log_z_estimate - logz) < 0.2
    assert abs(pt_raw.reports[-1].log_z_estimate - logz) < 0.2

    # posterior moments agree between frontends (same unconstrained
    # parameterization) within MC error
    m_dsl, m_raw = pt_dsl.mean(), pt_raw.mean()
    np.testing.assert_allclose(m_dsl, m_raw, atol=0.15)
    np.testing.assert_allclose(pt_dsl.var(), pt_raw.var(), atol=0.2)

    # and the barriers agree: same path geometry either way
    assert abs(pt_dsl.global_barrier - pt_raw.global_barrier) < 0.3

"""Model-library tests vs analytic oracles (reference test/test_stan.jl,
test_stepping_stone.jl, test_turing.jl analogues)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeons_tpu import (
    AutoMALA,
    SliceSampler,
    bernoulli_target,
    eight_schools,
    funnel,
    logistic_regression,
    pigeons,
    unid_target,
)
from pigeons_tpu.models import Normal, Uniform, HalfCauchy


def run(target, rounds=8, chains=6, explorer=None, seed=1):
    return pigeons(
        target=target, n_chains=chains, n_rounds=rounds, seed=seed,
        explorer=explorer, show_report=False,
    )


@pytest.mark.slow
def test_bernoulli_log_z_oracle():
    """Beta-binomial marginal: Z = B(1+s, 1+f) / B(1,1), s=2, f=8."""
    pt = run(bernoulli_target(), rounds=9)
    expected = (
        math.lgamma(3) + math.lgamma(9) - math.lgamma(12)
    )  # log B(3, 9)
    assert abs(pt.reports[-1].log_z_estimate - expected) < 0.15


@pytest.mark.slow
def test_unid_log_z_oracle():
    """Reference test_stepping_stone.jl: unid logZ within rtol 0.05."""
    try:
        from pigeons_tpu.models import unid_analytic_log_z

        expected = unid_analytic_log_z()
    except ImportError:  # pragma: no cover - scipy always present in CI image
        pytest.skip("scipy unavailable")
    pt = run(unid_target(), rounds=10)
    assert abs(pt.reports[-1].log_z_estimate - expected) < abs(expected) * 0.05


def test_eight_schools_posterior():
    """Under the reference Stan file's informative mu ~ N(0,5) prior, the
    posterior mean of mu is ~4.5 (precision-weighting of the ~8.6 pooled data
    mean against the prior), tau concentrated below ~8."""
    pt = run(eight_schools(), rounds=9, explorer=SliceSampler(n_passes=1))
    t = pt.inputs.target
    q = t.constrained_samples(pt)
    mu = q["mu"].mean()
    tau = q["tau"].mean()
    assert 2.5 < mu < 7.0
    assert 1.0 < tau < 8.0


@pytest.mark.slow
def test_centered_noncentered_agree():
    """Same posterior through two parameterizations (analogue of the
    reference's test_turing_stan_agree.jl: one model, two frontends)."""
    a = run(eight_schools(centered=False), rounds=9, explorer=SliceSampler(n_passes=1))
    b = run(eight_schools(centered=True), rounds=9, explorer=SliceSampler(n_passes=1))
    mu_a = a.inputs.target.constrained_samples(a)["mu"].mean()
    mu_b = b.inputs.target.constrained_samples(b)["mu"].mean()
    assert abs(mu_a - mu_b) < 2.0


def test_logistic_regression_likelihood_identity():
    """Default-tier guard on the rewritten likelihood: the one-transcendental
    form y*z - softplus(z) must equal the textbook
    y*log_sigmoid(z) + (1-y)*log_sigmoid(-z) (ADVICE r3: keep a fast
    regression check on the expression the bench exercises)."""
    t = logistic_regression(n=64, d=5, seed=3)
    # regenerate the synthetic data exactly as logistic_regression(seed=3) does
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    X = jax.random.normal(k1, (64, 5))
    w_true = jax.random.normal(k2, (5,))
    y = (jax.random.uniform(k3, (64,)) < jax.nn.sigmoid(X @ w_true)).astype(
        jnp.float32
    )
    key = jax.random.key(7)
    for i in range(3):
        q = {
            "w": jax.random.normal(jax.random.fold_in(key, 2 * i), (5,)),
            "b": jax.random.normal(jax.random.fold_in(key, 2 * i + 1), ()),
        }
        got = float(t.log_likelihood_fn(q))
        z = X @ q["w"] + q["b"]
        want = float(
            jnp.sum(y * jax.nn.log_sigmoid(z) + (1 - y) * jax.nn.log_sigmoid(-z))
        )
        np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.slow
def test_logistic_regression_recovers_signal():
    t = logistic_regression(n=150, d=4, seed=0)
    pt = run(t, rounds=8, explorer=AutoMALA())
    w_post = t.constrained_samples(pt)["w"].mean(axis=0)
    # the synthetic generator used w_true from the same seed
    key = jax.random.key(0)
    _, k2, _ = jax.random.split(key, 3)
    w_true = np.asarray(jax.random.normal(k2, (4,)))
    corr = np.corrcoef(w_post, w_true)[0, 1]
    assert corr > 0.8


def test_funnel_explores_neck():
    """y ~ N(0, 3) marginally: the tempered sampler must reach both tails
    (slice sampler = the reference's default explorer; AutoMALA alone is
    known to get stuck in the wide region on short runs)."""
    pt = run(funnel(4), rounds=9, chains=8, explorer=SliceSampler(n_passes=1))
    ys = pt.sample_array()[:, 0]
    assert ys.min() < -3.0 and ys.max() > 3.0
    assert abs(ys.mean()) < 1.2


def test_bijector_roundtrip():
    for dist, val in [
        (Uniform(-2.0, 1.0), 0.3),
        (HalfCauchy(2.0), 1.7),
        (Normal(1.0, 2.0), -0.5),
    ]:
        u = dist.bijector.inverse(jnp.asarray(val))
        x, _ = dist.bijector.forward(u)
        np.testing.assert_allclose(float(x), val, rtol=1e-5)


def test_sample_names():
    t = eight_schools()
    names = t.sample_names()
    assert names[0] == "theta_trans[0]"
    assert names[-1] == "log_density"
    assert len(names) == t.dim + 1


def test_poisson_count_end_to_end():
    """Full PT run on the mixed integer/continuous count model: pooled
    moments match Poisson(rate) (mean = var = rate) and N(0,1)."""
    import numpy as np

    import pigeons_tpu as pg

    pt = pg.pigeons(
        target=pg.poisson_count_target(5.0, 1),
        n_chains=2,
        n_rounds=9,
        seed=4,
        show_report=False,
    )
    mean, var = pt.mean(), pt.var()
    assert abs(mean[0] - 5.0) < 0.6 and abs(var[0] - 5.0) < 1.5
    assert abs(mean[1]) < 0.25 and abs(var[1] - 1.0) < 0.35
    samples = pt.sample_array()[:, 0]
    assert np.all(samples == np.round(samples))


def test_binary_mixture_end_to_end():
    """Full PT run on the mixed Bool/continuous target with the default
    explorer (in-sampler Gibbs for Bool coordinates): the marginal
    P(b_i = 1) must match the conditional-coupling posterior. With p = 0.4,
    mu = 0 the likelihood is flat in b, so the posterior marginal is p."""
    from pigeons_tpu import binary_mixture_target

    pt = run(binary_mixture_target(mu=0.0), rounds=9, chains=4)
    sa = pt.sample_array()
    b = sa[:, :2]
    assert set(np.unique(b)) <= {0.0, 1.0}
    assert abs(b.mean() - 0.4) < 0.05
    assert abs(sa[:, 2].mean()) < 0.15

"""Slice sampler kernel unit tests (reference ``test/test_slice_sampler.jl``
plus an invariance check in the spirit of ``Pigeons.invariance_test``)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from pigeons_tpu.ops import SliceSampler


def _run_batch(lp_fn, x0, key, n_steps=1, **kwargs):
    sl = SliceSampler(**kwargs)

    def one(key, x):
        def body(i, carry):
            x, lp = carry
            out = sl.step(jax.random.fold_in(key, i), x, lp, lp_fn, 1.0, (), 1)
            return (out.x, out.lp)

        lp0 = lp_fn(x)
        x, lp = jax.lax.fori_loop(0, n_steps, body, (x, lp0))
        return x

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(x0.shape[0]))
    return jax.jit(jax.vmap(one))(keys, x0)


def test_gaussian_invariance_ks():
    # start from exact target samples; one slice-sampler step must leave the
    # marginals unchanged (two-sample KS test, as in the reference's modified
    # Geweke test, ext/PigeonsHypothesisTestsExt)
    sigma = 2.0
    lp = lambda x: -0.5 * jnp.sum((x / sigma) ** 2)
    n, d = 4096, 3
    key = jax.random.key(0)
    x0 = sigma * jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    x1 = np.asarray(_run_batch(lp, x0, jax.random.fold_in(key, 2)))
    for c in range(d):
        stat = scipy.stats.ks_2samp(np.asarray(x0[:, c]), x1[:, c])
        assert stat.pvalue > 0.01 / d  # Bonferroni as in the reference


def test_mixes_from_bad_init():
    # started far in the tail, repeated slice sweeps must recover the target
    lp = lambda x: -0.5 * jnp.sum(x**2)
    n, d = 2048, 2
    x0 = jnp.full((n, d), 30.0)
    x1 = np.asarray(_run_batch(lp, x0, jax.random.key(7), n_steps=6))
    assert abs(x1.mean()) < 0.1
    assert abs(x1.var() - 1.0) < 0.1


def test_skewed_target_moments():
    # exponential-like asymmetric target via softplus transform check:
    # target exp(-sum(exp(x) - x)) has known mean under x -> log Gamma(1)...
    # keep it simple: correlated Gaussian, compare covariance
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    lp = lambda x: -0.5 * x @ prec @ x
    n = 4096
    key = jax.random.key(3)
    x0 = jax.random.multivariate_normal(
        jax.random.fold_in(key, 1), jnp.zeros(2), cov, (n,)
    )
    x1 = np.asarray(_run_batch(lp, x0.astype(jnp.float32), key, n_steps=3))
    emp = np.cov(x1.T)
    assert np.allclose(emp, np.asarray(cov), atol=0.12)


def test_respects_support_boundary():
    # half-line target: density -inf for x < 0; slice sampler must stay inside
    lp = lambda x: jnp.where(jnp.all(x > 0), -jnp.sum(x), -jnp.inf)
    n, d = 1024, 1
    key = jax.random.key(11)
    x0 = jax.random.exponential(jax.random.fold_in(key, 1), (n, d))
    x1 = np.asarray(_run_batch(lp, x0, jax.random.fold_in(key, 2), n_steps=2))
    assert np.all(x1 > 0)
    assert abs(x1.mean() - 1.0) < 0.1

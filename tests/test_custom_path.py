"""Custom annealing paths (reference ``path``/``interpolate`` extension point;
the JuliaBUGS-style temperature parameterization: prior + beta * likelihood)."""

import jax
import jax.numpy as jnp
import numpy as np

import pigeons_tpu as pg
from pigeons_tpu.models import CustomPath, CustomPathTarget


def _bugs_style_target(dim=2):
    # "model temperature" tempering: logprior + beta * loglikelihood, with a
    # Gaussian prior N(0,1) and likelihood pulling variance to 1/10
    def lp(x, beta):
        log_prior = -0.5 * jnp.sum(x * x)
        log_like = -0.5 * 9.0 * jnp.sum(x * x)
        return log_prior + beta * log_like

    path = CustomPath(
        log_density_fn=lp,
        sample_reference=lambda key: jax.random.normal(key, (dim,)),
    )
    return CustomPathTarget(path, dim=dim)


def test_custom_path_run_matches_oracle():
    # identical annealed family to toy_mvn_target: precision 1 -> 10
    pt = pg.pigeons(
        target=_bugs_style_target(2),
        explorer=pg.SliceSampler(),
        n_chains=4,
        n_rounds=9,
        show_report=False,
    )
    assert np.all(np.abs(pt.mean()) < 0.05)
    assert np.all(np.abs(pt.var() - 0.1) < 0.05)
    assert pt.n_round_trips > 0


def test_custom_path_beta_zero_is_prior():
    t = _bugs_style_target(3)
    x = jnp.ones((3,), jnp.float32)
    ref = t.default_reference()
    assert float(ref.log_density(x)) == float(-0.5 * 3)
    assert np.isclose(float(t.log_density(x)), -0.5 * 30.0)

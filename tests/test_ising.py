"""Discrete-state support: Ising model vs exact enumeration
(reference examples/ising.jl + the Bool coordinate path of SliceSampler.jl)."""

import numpy as np

from pigeons_tpu import pigeons
from pigeons_tpu.models import ising_target


def test_ising_vs_exact_enumeration():
    t = ising_target(beta_ising=0.4, base_length=3)
    lz, mag = t.enumerate_oracle()
    pt = pigeons(target=t, n_chains=6, n_rounds=10, seed=1, show_report=False)
    assert abs(pt.reports[-1].log_z_estimate - lz) < 0.2
    est_mag = np.abs((2.0 * pt.sample_array()[:, :-1] - 1.0).mean(axis=1)).mean()
    assert abs(est_mag - mag) < 0.05
    assert pt.n_round_trips > 50  # binary Gibbs + Bernoulli reference mix well
    # states stay exactly binary through swaps/checkpointable recorders
    assert set(np.unique(pt.sample_array()[:, :-1])) <= {0.0, 1.0}


def test_binary_gibbs_single_sweep_conditional():
    """One sweep from the all-aligned 2x2 state leaves it with the exact
    full-conditional probability (validates the Gibbs update math)."""
    import jax
    import jax.numpy as jnp

    from pigeons_tpu.ops import BinaryGibbs

    t = ising_target(beta_ising=0.4, base_length=2)
    lp_fn = t.log_density
    x = jnp.ones((4,), jnp.float32)
    exp = BinaryGibbs()

    @jax.jit
    @jax.vmap
    def sweep(key):
        return exp.step(key, x, lp_fn(x), lp_fn, 1.0, (), 2).x

    keys = jax.vmap(jax.random.key)(jnp.arange(3000))
    outs = np.asarray(sweep(keys))
    frac_left = (outs.min(axis=1) == 0).mean()
    # P(at least one of 4 flips) with per-site p ~ .039 sequential Gibbs ~ .15
    assert 0.10 < frac_left < 0.20

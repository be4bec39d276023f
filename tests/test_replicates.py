"""Batched replicate ladders (Inputs.n_replicates) and the batched (Pallas)
slice-sampler integration.

The replicate axis is the TPU-native scaling feature (BASELINE north star:
vmapped chains per chip): R independent PT systems share one compiled round
kernel, exploration runs as one flat batch of R*N lanes, swaps/recorders stay
per-ladder. The Pallas explorer is exercised through the interpreter on CPU
(tests force JAX_PLATFORMS=cpu; the compiled kernel runs in bench.py and on
the real chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeons_tpu import Inputs, PT, SliceSampler, SliceSamplerPallas, toy_mvn_target
from pigeons_tpu import rng as prng


def test_replicates_pool_moments():
    pt = PT(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=4,
            n_rounds=5,
            seed=1,
            n_replicates=16,
            show_report=False,
        )
    )
    pt.run()
    # pooled online moments across 16 ladders: much tighter than one ladder
    assert np.abs(pt.mean()).max() < 0.1
    assert np.abs(pt.var() - 0.1).max() < 0.05
    # traces pool scans x replicates x target chains
    assert pt.sample_array().shape == (2**5 * 16, 4)
    # round trips accumulate over all ladders
    assert pt.n_round_trips > 16


def test_replicates_deterministic():
    def run():
        return PT(
            Inputs(
                target=toy_mvn_target(2),
                n_chains=4,
                n_rounds=3,
                seed=7,
                n_replicates=4,
                show_report=False,
            )
        ).run()

    a, b = run(), run()
    assert np.array_equal(a.sample_array(), b.sample_array())
    assert a.n_round_trips == b.n_round_trips


def test_pallas_kernel_single_sweep_interpret():
    # one batched sweep through the interpreter: correct cached log density,
    # sane eval counts, and actual movement
    sl = SliceSamplerPallas(interpret=True, n_passes=1)
    B, d = 8, 3
    ld = lambda x, beta, isvar, rp: -0.5 * (0.5 + beta) * jnp.sum(x * x)
    xs = jnp.ones((B, d))
    betas = jnp.linspace(0.0, 1.0, B)
    lp0 = jax.vmap(lambda x, b: ld(x, b, 0.0, ()))(xs, betas)
    out = sl.step_batched(
        prng.keys_for(jax.random.key(0), jnp.arange(B)), xs, lp0, ld, betas,
        jnp.zeros(B), (), (), 1
    )
    lp_direct = jax.vmap(lambda x, b: ld(x, b, 0.0, ()))(out.x, betas)
    np.testing.assert_allclose(np.asarray(out.lp), np.asarray(lp_direct), atol=1e-5)
    ne = np.asarray(out.n_steps)
    assert (ne >= 2 * d).all() and (ne < 200).all()  # ~2 + shrink evals per coord
    assert not np.allclose(np.asarray(out.x), np.asarray(xs))
    assert np.asarray(out.accept_sum).sum() > 0


def test_pallas_kernel_coord_delta_sweep_interpret():
    # separable density: the kernel answers proposals as O(1) deltas; the
    # returned lp must still be the exactly-recomputed density of the output
    sl = SliceSamplerPallas(interpret=True, n_passes=1)
    B, d = 8, 3
    scale = jnp.arange(1.0, d + 1.0)

    def ld(x, beta, isvar, rp):
        return -0.5 * (0.5 + beta) * jnp.sum(scale * x * x)

    def ld_coord(v, c, beta, isvar, rp):
        return -0.5 * (0.5 + beta) * scale[c] * v * v

    xs = jnp.ones((B, d))
    betas = jnp.linspace(0.0, 1.0, B)
    lp0 = jax.vmap(lambda x, b: ld(x, b, 0.0, ()))(xs, betas)
    out = sl.step_batched(
        prng.keys_for(jax.random.key(0), jnp.arange(B)), xs, lp0, ld, betas,
        jnp.zeros(B), (), (), 1,
        ld_coord=ld_coord,
    )
    lp_direct = jax.vmap(lambda x, b: ld(x, b, 0.0, ()))(out.x, betas)
    np.testing.assert_allclose(np.asarray(out.lp), np.asarray(lp_direct), atol=1e-5)
    assert not np.allclose(np.asarray(out.x), np.asarray(xs))
    assert np.asarray(out.accept_sum).sum() > 0


def test_pallas_explorer_end_to_end_interpret():
    pt = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=4,
            n_rounds=2,
            seed=3,
            explorer=SliceSamplerPallas(interpret=True, n_passes=1),
            show_report=False,
        )
    )
    pt.run()
    assert np.isfinite(pt.reports[-1].log_z_estimate)
    assert pt.sample_array().shape[1] == 3


@pytest.mark.slow
def test_pallas_variational_banded():
    # the variational Gaussian reference is mean-field (separable), so the
    # banded kernel runs under it: mean/std ride as banded coord blocks and
    # the run stays on the fast path through reference activation (round 6)
    pt = PT(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=3,
            n_chains_variational=3,
            n_rounds=7,
            seed=5,
            explorer=SliceSamplerPallas(interpret=True, n_passes=1),
            show_report=False,
        )
    )
    pt.run()
    assert np.isfinite(pt.global_barrier_variational)
    # after the Gaussian reference activates on a Gaussian target, the
    # variational leg's barrier collapses (reference test_variational.jl:96-100)
    assert pt.global_barrier_variational < 0.5
    assert np.abs(pt.mean()).max() < 0.15


@pytest.mark.slow
def test_pallas_coord_arrays_vs_xla_moments():
    # banded kernel fed per-coordinate params must sample the same law as
    # the XLA slice sampler (distinct RNG streams: compare moments)
    import jax.numpy as jnp
    from pigeons_tpu.variational import GaussianReference

    def run(explorer):
        pt = PT(
            Inputs(
                target=toy_mvn_target(2),
                n_chains=0,
                n_chains_variational=4,
                n_rounds=8,
                seed=2,
                n_replicates=8,
                explorer=explorer,
                show_report=False,
            )
        )
        pt.run()
        return pt

    a = run(SliceSamplerPallas(interpret=True, n_passes=1))
    b = run(SliceSampler(n_passes=1))
    np.testing.assert_allclose(a.mean(), b.mean(), atol=0.08)
    np.testing.assert_allclose(a.var(), b.var(), atol=0.08)


def test_replicates_with_two_leg_variational():
    """n_replicates > 1 combined with the two-leg variational ladder
    (VERDICT r2 weak item 7): per-ladder swaps/recorders vmap over the
    two-leg layout, pooled moments stay correct, and the variational
    barrier collapses after activation."""
    pt = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=3,
            n_chains_variational=3,
            n_rounds=7,
            seed=6,
            n_replicates=8,
            show_report=False,
        )
    )
    pt.run()
    assert np.isfinite(pt.global_barrier_variational)
    assert pt.global_barrier_variational < 0.6
    assert np.abs(pt.mean()).max() < 0.1
    assert np.abs(pt.var() - 0.1).max() < 0.06
    # traces pool scans x replicates x BOTH junction target chains
    assert pt.sample_array().shape == (2**7 * 8 * 2, 3)
    # determinism of the combined configuration
    pt2 = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=3,
            n_chains_variational=3,
            n_rounds=7,
            seed=6,
            n_replicates=8,
            show_report=False,
        )
    )
    pt2.run()
    assert np.array_equal(pt.sample_array(), pt2.sample_array())

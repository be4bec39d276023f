"""Exact invariance tests for every kernel + a broken-kernel negative control
(reference test/test_invariance_test.jl)."""

import jax.numpy as jnp
import pytest

from pigeons_tpu import AAPS, AutoMALA, MALA, NUTS, SliceSampler, funnel, toy_mvn_target
from pigeons_tpu.invariance_test import invariance_test
from pigeons_tpu.ops import IdentityPreconditioner
from pigeons_tpu.ops.base import Explorer, StepOut

N = 4000  # smaller than the reference's 10k, still sharp enough at alpha=.005


@pytest.mark.parametrize(
    "explorer",
    [
        SliceSampler(n_passes=1),
        MALA(step_size=0.4, preconditioner=IdentityPreconditioner()),
        AutoMALA(preconditioner=IdentityPreconditioner()),
        AAPS(step_size=0.4, preconditioner=IdentityPreconditioner()),
        NUTS(step_size=0.5, preconditioner=IdentityPreconditioner()),
    ],
    ids=["slice", "mala", "automala", "aaps", "nuts"],
)
def test_kernels_invariant_toy_mvn(explorer):
    res = invariance_test(toy_mvn_target(3), explorer, n_iid_samples=N)
    assert res.passed, f"failed dims {res.failed_dims}, pvalues {res.pvalues}"


def test_slice_invariant_funnel():
    res = invariance_test(funnel(3), SliceSampler(n_passes=1), n_iid_samples=N)
    assert res.passed, f"pvalues {res.pvalues}"


def test_combinators_invariant_toy_mvn():
    """Mix and ScanMix leave the target exactly invariant (any
    state-independent component schedule preserves the target — the Geweke
    battery checks the SCAN-LEVEL kernel, so ScanMix's deterministic
    component cycling is covered by its invariance at every scan index)."""
    from pigeons_tpu import Mix, ScanMix

    for combinator in (Mix, ScanMix):
        explorer = combinator(
            SliceSampler(n_passes=1),
            MALA(step_size=0.4, preconditioner=IdentityPreconditioner()),
        )
        res = invariance_test(toy_mvn_target(3), explorer, n_iid_samples=N)
        assert res.passed, (
            combinator.__name__, res.failed_dims, res.pvalues
        )


class BrokenKernel(Explorer):
    """Deterministic drift: obviously not invariant."""

    def step(self, key, x, lp0, lp_fn, beta, chain_params, scan_idx) -> StepOut:
        x2 = x + 0.2
        z = jnp.zeros((), jnp.float32)
        return StepOut(x2, lp_fn(x2), z, z, z)


def test_broken_kernel_detected():
    res = invariance_test(toy_mvn_target(3), BrokenKernel(), n_iid_samples=N)
    assert not res.passed


def test_slice_invariant_integer_coords():
    """Mixed integer/continuous target (reference SliceSampler.jl:136-142,189
    integer conventions): one explorer step leaves Poisson(5) x N(0,1)
    invariant, and integer coordinates stay whole."""
    import jax
    import numpy as np
    from pigeons_tpu import poisson_count_target

    t = poisson_count_target(5.0, 1)
    explorer = t.default_explorer()
    res = invariance_test(t, explorer, n_iid_samples=N)
    assert res.passed, f"failed dims {res.failed_dims}, pvalues {res.pvalues}"

    # mechanics: stepped states keep whole values at the count coordinate
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(3), jnp.arange(256)
    )
    xs = jax.vmap(t.sample_iid_target)(keys)
    cp = jax.tree_util.tree_map(lambda a: a[0], explorer.init_state(1, t.dim))
    out = jax.vmap(
        lambda k, x: explorer.step(
            k, x, t.log_density(x), t.log_density, 1.0, cp, 2
        )
    )(keys, xs)
    k_col = np.asarray(out.x[:, 0])
    assert np.all(k_col == np.round(k_col)) and np.all(k_col >= 0)
    assert not np.allclose(k_col, np.asarray(xs[:, 0]))  # it actually moves


def test_integer_slice_width_validation():
    from pigeons_tpu import SliceSampler as SS

    with pytest.raises(ValueError, match="whole-number"):
        SS(w=2.5, integer_mask=[True])


def test_slice_invariant_binary_coords_default_explorer():
    """Mixed Bool/continuous target under the DEFAULT explorer (no manual
    Compose): binary_mask auto-detection routes the Bool coordinates to the
    in-sampler exact Gibbs draw (reference SliceSampler.jl:65-86), and one
    step leaves Bernoulli(0.4)^2 x N(mu*(b1+b2), 1)^2 invariant."""
    import jax
    import numpy as np
    from pigeons_tpu import SliceSampler, binary_mixture_target

    t = binary_mixture_target()
    explorer = t.default_explorer()
    assert isinstance(explorer, SliceSampler)
    assert explorer.binary_mask is not None and explorer.binary_mask[:2].all()
    res = invariance_test(t, explorer, n_iid_samples=N)
    assert res.passed, f"failed dims {res.failed_dims}, pvalues {res.pvalues}"

    # mechanics: Bool coordinates stay in {0, 1} and actually flip
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(4), jnp.arange(512)
    )
    xs = jax.vmap(t.sample_iid_target)(keys)
    cp = jax.tree_util.tree_map(lambda a: a[0], explorer.init_state(1, t.dim))
    out = jax.vmap(
        lambda k, x: explorer.step(
            k, x, t.log_density(x), t.log_density, 1.0, cp, 2
        )
    )(keys, xs)
    b = np.asarray(out.x[:, :2])
    assert set(np.unique(b)) <= {0.0, 1.0}
    assert not np.array_equal(b, np.asarray(xs[:, :2]))  # flips happen

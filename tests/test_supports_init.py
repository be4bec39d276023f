"""Edge-case parity: mismatched target/reference supports and custom
initialization.

Mirrors reference ``test/test_logz_diff_supports.jl`` (PT must be robust to
-inf densities when the reference and target have different supports — the
interpolator's 0 * (-inf) = 0 endpoint guard, ``paths._guarded_mul``) and
``test/test_init.jl`` (a target's custom ``initialization`` determines the
replica states, observable at ``n_rounds=0``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeons_tpu import Inputs, PT, pigeons, toy_mvn_target
from pigeons_tpu.models.target import Reference, Target


class UniformBox(Target):
    """Normalized uniform on [lo, hi]^dim; -inf log density outside."""

    def __init__(self, lo: float, hi: float, dim: int = 1):
        self.lo, self.hi, self.dim = float(lo), float(hi), int(dim)

    def log_density(self, x):
        inside = jnp.all((x >= self.lo) & (x <= self.hi))
        ld = -self.dim * jnp.log(jnp.float32(self.hi - self.lo))
        return jnp.where(inside, ld, -jnp.inf)

    def default_reference(self) -> Reference:
        lo, hi, dim = self.lo, self.hi, self.dim
        return Reference(
            log_density=self.log_density,
            sample_iid=lambda key: jax.random.uniform(
                key, (dim,), minval=lo, maxval=hi
            ),
        )

    def initialization(self, key):
        # inside the overlap of every support used in these tests
        return jnp.full((self.dim,), 1.0, jnp.float32)


@pytest.mark.parametrize(
    "t_lo,t_hi,r_lo,r_hi", [(-2.0, 2.0, 0.0, 2.0), (0.0, 2.0, -2.0, 2.0)]
)
def test_logz_different_supports(t_lo, t_hi, r_lo, r_hi):
    # reference test only asserts the runs complete; additionally pin down
    # that the estimate is finite and the wider-support box is explored
    target = UniformBox(t_lo, t_hi)
    ref = UniformBox(r_lo, r_hi).default_reference()
    pt = pigeons(
        target=target, reference=ref, n_chains=4, n_rounds=8, seed=1,
        show_report=False,
    )
    assert np.isfinite(pt.reports[-1].log_z_estimate)
    samples = pt.sample_array()[:, 0]
    assert np.isfinite(samples).all()
    if t_lo < r_lo:
        # wider target: the half outside the reference support is reachable
        assert samples.min() < t_lo / 2.0
    else:
        # narrower target: its chain must stay inside its own support
        assert samples.min() >= t_lo and samples.max() <= t_hi


def test_custom_initialization():
    base = toy_mvn_target(3)

    class WithInit(Target):
        def __init__(self, inner):
            self.inner = inner
            self.dim = inner.dim

        def log_density(self, x):
            return self.inner.log_density(x)

        def default_reference(self):
            return self.inner.default_reference()

        def initialization(self, key):
            return jnp.full((self.dim,), 0.5, jnp.float32)

    pt = PT(
        Inputs(
            target=WithInit(base), n_chains=4, n_rounds=0, seed=1,
            show_report=False,
        )
    )
    np.testing.assert_array_equal(np.asarray(pt.states), 0.5)

"""Minimal distribution library: log densities, iid samplers, and bijectors
to unconstrained space.

Plays the role of the reference's ``DistributionLogPotential`` (wrap any
distribution as a target or reference, ``src/targets/
DistributionLogPotential.jl``) and of Stan's constrained-parameter transforms
(``link``/``invlink`` in the Turing ext, ``param_constrain`` in the BridgeStan
ext): every distribution carries a bijector ``unconstrained -> support`` with
log-Jacobian, so gradient explorers always operate on an unconstrained vector.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# bijectors: unconstrained u -> constrained x, with log |dx/du|
# ---------------------------------------------------------------------------


class Identity:
    def forward(self, u):
        return u, jnp.zeros(())

    def inverse(self, x):
        return x


class Positive:
    """x = exp(u), Stan's lower-bound transform."""

    def forward(self, u):
        return jnp.exp(u), jnp.sum(u)

    def inverse(self, x):
        return jnp.log(x)


@dataclass(frozen=True)
class Interval:
    """x = lo + (hi - lo) * sigmoid(u), Stan's two-sided transform."""

    lo: float
    hi: float

    def forward(self, u):
        s = jax.nn.sigmoid(u)
        x = self.lo + (self.hi - self.lo) * s
        logjac = jnp.sum(
            jnp.log(self.hi - self.lo) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u)
        )
        return x, logjac

    def inverse(self, x):
        t = (x - self.lo) / (self.hi - self.lo)
        t = jnp.clip(t, 1e-7, 1.0 - 1e-7)
        return jnp.log(t) - jnp.log1p(-t)


# ---------------------------------------------------------------------------
# distributions (with event shape, used as priors / references)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Distribution:
    # keyword-only so subclass parameters (loc, scale, ...) stay positional
    shape: Tuple[int, ...] = field(default=(), kw_only=True)

    bijector = Identity()

    @property
    def size(self) -> int:
        return int(np_prod(self.shape))

    def log_prob(self, x):  # summed over the event
        raise NotImplementedError

    def sample(self, key):
        raise NotImplementedError


def np_prod(shape):
    out = 1
    for s in shape:
        out *= s
    return out


@dataclass(frozen=True)
class Normal(Distribution):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return jnp.sum(-0.5 * (LOG_2PI + z * z) - jnp.log(self.scale))

    def sample(self, key):
        return self.loc + self.scale * jax.random.normal(key, self.shape)


@dataclass(frozen=True)
class Uniform(Distribution):
    lo: float = 0.0
    hi: float = 1.0

    @property
    def bijector(self):
        return Interval(self.lo, self.hi)

    def log_prob(self, x):
        return jnp.sum(jnp.full(self.shape, -jnp.log(self.hi - self.lo)))

    def sample(self, key):
        return jax.random.uniform(key, self.shape, minval=self.lo, maxval=self.hi)


@dataclass(frozen=True)
class Beta(Distribution):
    a: float = 1.0
    b: float = 1.0

    @property
    def bijector(self):
        return Interval(0.0, 1.0)

    def log_prob(self, x):
        lbeta = (
            jax.scipy.special.gammaln(self.a)
            + jax.scipy.special.gammaln(self.b)
            - jax.scipy.special.gammaln(self.a + self.b)
        )
        return jnp.sum((self.a - 1) * jnp.log(x) + (self.b - 1) * jnp.log1p(-x) - lbeta)

    def sample(self, key):
        return jax.random.beta(key, self.a, self.b, self.shape)


@dataclass(frozen=True)
class Cauchy(Distribution):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return jnp.sum(-jnp.log(jnp.pi * self.scale) - jnp.log1p(z * z))

    def sample(self, key):
        return self.loc + self.scale * jax.random.cauchy(key, self.shape)


@dataclass(frozen=True)
class HalfCauchy(Distribution):
    scale: float = 1.0

    bijector = Positive()

    def log_prob(self, x):
        z = x / self.scale
        return jnp.sum(
            jnp.log(2.0) - jnp.log(jnp.pi * self.scale) - jnp.log1p(z * z)
        )

    def sample(self, key):
        return jnp.abs(self.scale * jax.random.cauchy(key, self.shape))


@dataclass(frozen=True)
class Exponential(Distribution):
    rate: float = 1.0

    bijector = Positive()

    def log_prob(self, x):
        return jnp.sum(jnp.log(self.rate) - self.rate * x)

    def sample(self, key):
        return jax.random.exponential(key, self.shape) / self.rate


@dataclass(frozen=True)
class LogNormal(Distribution):
    loc: float = 0.0
    scale: float = 1.0

    bijector = Positive()

    def log_prob(self, x):
        lx = jnp.log(x)
        z = (lx - self.loc) / self.scale
        return jnp.sum(-0.5 * (LOG_2PI + z * z) - jnp.log(self.scale) - lx)

    def sample(self, key):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, self.shape))


# ---------------------------------------------------------------------------
# likelihood helpers
# ---------------------------------------------------------------------------


def normal_logpdf(y, loc, scale):
    z = (y - loc) / scale
    return jnp.sum(-0.5 * (LOG_2PI + z * z) - jnp.log(scale))


def bernoulli_logpmf(y, p):
    return jnp.sum(jnp.where(y > 0, jnp.log(p), jnp.log1p(-p)))


def binomial_logpmf(successes, trials, p):
    # the combinatorial constant matters for normalization-constant estimates
    logc = (
        jax.scipy.special.gammaln(trials + 1.0)
        - jax.scipy.special.gammaln(successes + 1.0)
        - jax.scipy.special.gammaln(trials - successes + 1.0)
    )
    return logc + successes * jnp.log(p) + (trials - successes) * jnp.log1p(-p)

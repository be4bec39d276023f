"""Target interface: what a model must provide to be tempered.

Reference interface (``src/targets/target.jl:4-99``): ``initialization``,
``default_explorer`` (slice sampler), ``default_reference``, ``sample_iid!``,
``create_path`` (default: linear interpolation reference -> target). The
TPU-native contract replaces dynamic dispatch with traced callables:

  * ``log_density(x)``: traced target log density for one state vector;
  * ``default_reference()``: a :class:`Reference` (log density + iid sampler);
  * ``create_path(reference)``: object with ``log_density(x, beta)`` (and
    optionally ``sample_at(key, beta)`` for iid-at-any-beta toy paths);
  * ``initialization(key)``: one initial state (vmapped over replicas).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..paths import InterpolatingPath


@dataclass(frozen=True)
class Reference:
    """A reference distribution: unnormalized log density + iid sampler."""

    log_density: Callable  # x -> scalar
    sample_iid: Optional[Callable] = None  # key -> x


class Target:
    dim: int

    def log_density(self, x):
        raise NotImplementedError

    def default_reference(self) -> Reference:
        raise NotImplementedError

    def default_explorer(self):
        from ..ops import SliceSampler

        return SliceSampler()

    def create_path(self, reference: Reference):
        return InterpolatingPath(
            ref_log_density=reference.log_density,
            target_log_density=self.log_density,
            sample_reference=reference.sample_iid,
        )

    def initialization(self, key):
        ref = self.default_reference()
        if ref.sample_iid is None:
            return jnp.zeros((self.dim,), jnp.float32)
        return ref.sample_iid(key)


@dataclass(frozen=True)
class StandardNormalReference:
    """N(0, sigma^2 I) reference, the generic default."""

    dim: int
    sigma: float = 1.0

    def as_reference(self) -> Reference:
        sigma = self.sigma
        dim = self.dim

        def log_density(x):
            return -0.5 * jnp.sum((x / sigma) ** 2)

        def sample_iid(key):
            return sigma * jax.random.normal(key, (dim,))

        return Reference(log_density=log_density, sample_iid=sample_iid)

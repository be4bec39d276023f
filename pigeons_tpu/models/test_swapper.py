"""Constant-acceptance toy swapper isolating communication from exploration.

Reference: ``src/swap/pair_swapper.jl:100-149`` — all swaps accept with a
fixed probability, no state, no swap-statistic recording; used for the exact
round-trip combinatorics tests and communication benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .target import Reference, Target


@dataclass(frozen=True)
class TestSwapper(Target):
    constant_swap_accept_pr: float

    dim: int = 1

    def log_density(self, x):
        return jnp.zeros((), jnp.float32)

    def default_reference(self) -> Reference:
        return Reference(
            log_density=lambda x: jnp.zeros((), jnp.float32),
            sample_iid=None,
        )

    def default_explorer(self):
        from ..ops import NoOpExplorer

        return NoOpExplorer()

    def initialization(self, key):
        return jnp.zeros((self.dim,), jnp.float32)

    # consumed by the runtime to override the Metropolis acceptance rule
    def swap_accept_fn(self):
        pr = self.constant_swap_accept_pr
        return lambda stat_sum: jnp.full_like(stat_sum, pr)

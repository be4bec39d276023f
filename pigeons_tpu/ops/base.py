"""Explorer interface: within-chain MCMC kernels as vmappable JAX functions.

Reference interface (``src/explorers/explorer.jl:7-55``): ``step!`` must leave
the replica's current tempered distribution invariant; ``adapt_explorer`` runs
between rounds. The TPU-native contract:

  * ``step(key, x, lp0, lp_fn, beta, chain_params) -> StepOut`` operates on a
    SINGLE replica with static shapes and bounded control flow; the runtime
    vmaps it over the whole replica batch so all chains' density evaluations
    fuse into one XLA computation.
  * ``init_state(n_chains, dim)`` returns the per-chain adaptation pytree
    (e.g. step sizes); ``chain_params`` passed to ``step`` is that pytree
    gathered at the replica's current chain.
  * ``adapt(state, reduced, round_idx)`` runs host-side between rounds.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class StepOut(NamedTuple):
    x: jax.Array
    lp: jax.Array  # log density of x at the replica's current beta
    accept_sum: jax.Array  # contribution to explorer_acceptance_pr
    accept_n: jax.Array
    n_steps: jax.Array  # contribution to explorer_n_steps


def _zero_stats():
    z = jnp.zeros((), jnp.float32)
    return z, z, z


class Explorer:
    def init_state(self, n_chains: int, dim: int) -> Any:
        return ()

    def step(self, key, x, lp0, lp_fn, beta, chain_params) -> StepOut:
        raise NotImplementedError

    def adapt(self, state, reduced, round_idx: int):
        return state


class ToyExplorer(Explorer):
    """iid regeneration at every chain, for paths that are iid-sampleable at
    every beta (reference ``src/explorers/ToyExplorer.jl``)."""

    def __init__(self, path):
        self.path = path  # must provide sample_at(key, beta)

    def step(self, key, x, lp0, lp_fn, beta, chain_params) -> StepOut:
        x_new = self.path.sample_at(key, beta)
        a, n, s = _zero_stats()
        return StepOut(x_new, lp_fn(x_new), a, n, s)


class NoOpExplorer(Explorer):
    """Identity move, used with the TestSwapper communication-only toy target
    (reference ``pair_swapper.jl:139-141``: its explorer is ``nothing``)."""

    def step(self, key, x, lp0, lp_fn, beta, chain_params) -> StepOut:
        a, n, s = _zero_stats()
        return StepOut(x, lp0, a, n, s)

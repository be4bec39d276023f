"""MALA: Metropolis-adjusted Langevin with a fixed step size.

Reference semantics (``src/explorers/MALA.jl``): per exploration,
``base_n_refresh * ceil(dim^exponent_n_refresh)`` momentum refreshments, each
one preconditioned leapfrog step followed by an MH correction with momentum
flip; the preconditioner (default the zero-one-inflated mixture) is rebuilt
from the estimated target std deviations each refreshment; std deviations are
re-estimated between rounds (``adapt_explorer``). Step size is NOT adapted
(use AutoMALA for that).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import Explorer, StepOut
from .hamiltonian import (
    MixDiagonalPreconditioner,
    leapfrog1_cached,
    log_joint,
    value_and_cond_grad,
)


class MALA(Explorer):
    def __init__(
        self,
        step_size: float = 1.0,
        base_n_refresh: int = 3,
        exponent_n_refresh: float = 0.35,
        preconditioner=None,
    ):
        self.step_size = float(step_size)
        self.base_n_refresh = int(base_n_refresh)
        self.exponent_n_refresh = float(exponent_n_refresh)
        self.preconditioner = (
            preconditioner if preconditioner is not None else MixDiagonalPreconditioner()
        )

    def n_refresh(self, dim: int) -> int:
        return self.base_n_refresh * math.ceil(dim**self.exponent_n_refresh)

    def init_state(self, n_chains: int, dim: int):
        return {
            "step_size": jnp.full((n_chains,), self.step_size, jnp.float32),
            "std_devs": jnp.ones((n_chains, dim), jnp.float32),
        }

    def needs_online_moments(self) -> bool:
        return self.preconditioner.adapts

    def adapt(self, state, reduced, round_idx: int):
        if not self.preconditioner.adapts:
            return state
        # estimated target std devs from the online variance recorder (the
        # reference's _transformed_online; last entry is the log density)
        std = np.sqrt(np.maximum(reduced.online_var[:-1], 0.0))
        n, d = state["std_devs"].shape
        return {
            "step_size": state["step_size"],
            "std_devs": jnp.tile(jnp.asarray(std, jnp.float32)[None, :], (n, 1)),
        }

    def step(self, key, x, lp0, lp_fn, beta, chain_params, scan_idx) -> StepOut:
        n_refresh = self.n_refresh(x.shape[0])
        step_size = chain_params["step_size"]
        std_devs = chain_params["std_devs"]

        def refresh(i, carry):
            # the start-point RAW gradient rides the carry: one gradient
            # evaluation per refresh (at the proposal) instead of two
            x, lp, raw_grad, a_s, a_n, ns = carry
            k = jax.random.fold_in(key, i)
            k_mom, k_prec, k_mh = jax.random.split(k, 3)
            precond = self.preconditioner.build(k_prec, std_devs)
            v = jax.random.normal(k_mom, x.shape, x.dtype)
            h0 = log_joint(lp, v)
            x_new, v_new, lp_new, cgrad_new, ok = leapfrog1_cached(
                lp_fn, precond, x, v, step_size, raw_grad / precond
            )
            # flip momentum (involution); ||v||^2 unchanged by the flip
            h1 = log_joint(lp_new, v_new)
            pr = jnp.where(ok, jnp.minimum(1.0, jnp.exp(h1 - h0)), 0.0)
            accept = jax.random.uniform(k_mh) < pr
            x = jnp.where(accept, x_new, x)
            lp = jnp.where(accept, lp_new, lp)
            raw_grad = jnp.where(accept, cgrad_new * precond, raw_grad)
            # n_steps counts leapfrogs, as the reference records (MALA.jl:96)
            return x, lp, raw_grad, a_s + pr, a_n + 1.0, ns + 1.0

        z = jnp.zeros((), jnp.float32)
        _, cgrad0 = value_and_cond_grad(lp_fn, x, jnp.ones_like(x))
        x, lp, _, a_s, a_n, ns = lax.fori_loop(
            0, n_refresh, refresh, (x, lp0, cgrad0, z, z, z)
        )
        return StepOut(x, lp, a_s, a_n, ns)

"""Hamiltonian dynamics core: preconditioned leapfrog in velocity space.

Reference semantics (``src/explorers/hamiltonian_dynamics.jl``): the mass
matrix M approximates the inverse target covariance; the integrator works with
the *velocity* y = M^{-1/2} p ~ N(0, I), so
    y* = y + (eps/2) M^{-1/2} grad(log pi)(x)
    x' = x + eps M^{-1/2} y*
    y' = y* + (eps/2) M^{-1/2} grad(log pi)(x')
with ``diag_precond`` = M^{1/2} stored as a vector. ``log_joint`` =
log pi(x) - ||y||^2 / 2. Divergences (non-finite joint) flag the move invalid.

Preconditioners (``src/explorers/Preconditioner.jl``): identity; diagonal
(1/std of the estimated target std devs); and the zero-one-inflated random
mixture mix + (1-mix)/std with P(mix=0)=p0, P(mix=1)=p1, else mix~U(0,1)
(robust to scale mismatch, per the autoMALA paper).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax


def log_joint(logp, velocity):
    return logp - 0.5 * jnp.sum(velocity * velocity)


def value_and_cond_grad(lp_fn, x, diag_precond):
    """(log pi(x), M^{-1/2} grad log pi(x))."""
    logp, grad = jax.value_and_grad(lp_fn)(x)
    return logp, grad / diag_precond


def leapfrog1_cached(lp_fn, diag_precond, x, v, step_size, cgrad0):
    """One leapfrog step with the starting-point conditioned gradient
    ``cgrad0 = grad(log pi)(x) / diag_precond`` supplied by the caller.

    Within AutoMALA's step-size search the start point is FIXED across every
    trial step, so its gradient is computed once per refresh instead of once
    per trial — halving the gradient-evaluation cost of the search (the
    reference's ``leap_frog!`` recomputes it every call,
    ``hamiltonian_dynamics.jl:39-77``). Returns
    (x', v', logp', cgrad', finite)."""
    v1 = v + 0.5 * step_size * cgrad0
    x1 = x + step_size * (v1 / diag_precond)
    logp1, cgrad1 = value_and_cond_grad(lp_fn, x1, diag_precond)
    v2 = v1 + 0.5 * step_size * cgrad1
    ok = jnp.isfinite(log_joint(logp1, v1)) & jnp.isfinite(jnp.sum(v2 * v2))
    return x1, v2, logp1, cgrad1, ok


def leapfrog(lp_fn, diag_precond, x, v, step_size, n_steps: int = 1):
    """n_steps of leapfrog with Neal's merged half-steps.

    Returns (x', v', logp', finite) where ``finite`` is False on divergence —
    the caller treats the move as invalid (reference
    ``hamiltonian_dynamics.jl:39-77`` returns false)."""
    logp, grad = value_and_cond_grad(lp_fn, x, diag_precond)
    v = v + 0.5 * step_size * grad

    def body(i, carry):
        x, v, logp, grad, ok = carry
        x_n = x + step_size * (v / diag_precond)
        logp_n, grad_n = value_and_cond_grad(lp_fn, x_n, diag_precond)
        ok_n = ok & jnp.isfinite(log_joint(logp_n, v))
        # Neal's merged full step on velocity, except after the last step
        is_last = i == n_steps - 1
        v_n = jnp.where(is_last, v, v + step_size * grad_n)
        return x_n, v_n, logp_n, grad_n, ok_n

    x, v, logp, grad, ok = lax.fori_loop(
        0, n_steps, body, (x, v, logp, grad, jnp.asarray(True))
    )
    v = v + 0.5 * step_size * grad
    ok = ok & jnp.isfinite(jnp.sum(v * v))
    return x, v, logp, ok


# ---------------------------------------------------------------------------
# preconditioners
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class IdentityPreconditioner:
    def build(self, key, std_devs):
        return jnp.ones_like(std_devs)

    adapts = False


@dataclass(frozen=True)
class DiagonalPreconditioner:
    def build(self, key, std_devs):
        return jnp.where(std_devs == 0.0, 1.0, 1.0 / std_devs)

    adapts = True


@dataclass(frozen=True)
class MixDiagonalPreconditioner:
    """Reference ``Preconditioner.jl:53-76``; defaults p0 = p1 = 1/3."""

    p0: float = 1.0 / 3.0
    p1: float = 1.0 / 3.0

    def __post_init__(self):
        if not 0.0 <= self.p0 + self.p1 <= 1.0:
            raise ValueError("p0 + p1 must lie in [0, 1]")

    def build(self, key, std_devs):
        k_u, k_mix = jax.random.split(key)
        u = jax.random.uniform(k_u)
        mix = jax.random.uniform(k_mix)
        inv = jnp.where(std_devs == 0.0, 1.0, 1.0 / std_devs)
        blended = jnp.where(std_devs == 0.0, 1.0, mix + (1.0 - mix) * inv)
        return jnp.where(
            u <= self.p0, inv, jnp.where(u <= self.p0 + self.p1, jnp.ones_like(inv), blended)
        )

    adapts = True

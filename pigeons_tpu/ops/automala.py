"""AutoMALA: MALA with per-step automatic step-size selection.

Reference semantics (``src/explorers/AutoMALA.jl``, Biron-Lattes et al. 2024):
per refreshment, draw (a, b) ~ U(0,1)^2 giving log-acceptance bounds
[log min(a,b), log max(a,b)]; starting from the round's base step size, double
(grow) or halve (shrink) until the one-step leapfrog log-joint difference
enters the bounds; move with the selected step size; then re-run the search
from the proposal with flipped momentum and require the same exponent (the
reversibility check) before the MH correction. MH is skipped on the first
scan of each round (transient phase). Between rounds the base step size is
multiplied by the mean across chains of the mean selected factor 2^exponent,
and the preconditioner std deviations are re-estimated.

TPU-native notes: the grow/shrink search is one unified bounded
``lax.while_loop`` (direction +-1); under vmap all chains run the search in
lockstep with masking. The search is capped at ``max_exponent`` halvings/
doublings (the reference errors on float underflow instead;
``AutoMALA.jl:236-239``).

Measured alternative (r3): a speculative sweep evaluating the leapfrog at
every exponent in a window as one batched trial (to collapse the sequential
trip chain) ran ~2x SLOWER on the TPU at any window width — the masked
sequential loop's body fuses into one tiny kernel and per-lane trip counts
concentrate near zero after adaptation, so the search is throughput-bound on
the target's gradient (for the logistic-regression bench, VPU transcendental
throughput), not on sequential depth. Keep the sequential structure.
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


class AutoMALA(Explorer):
    extra_names = ("am_factor", "reversibility_rate")

    def __init__(
        self,
        step_size: float = 1.0,
        base_n_refresh: int = 3,
        exponent_n_refresh: float = 0.35,
        preconditioner=None,
        max_exponent: int = 40,
    ):
        self.step_size = float(step_size)
        self.base_n_refresh = int(base_n_refresh)
        self.exponent_n_refresh = float(exponent_n_refresh)
        self.preconditioner = (
            preconditioner if preconditioner is not None else MixDiagonalPreconditioner()
        )
        self.max_exponent = int(max_exponent)

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
        # step size *= mean over chains of the chain-mean selected factor
        # (reference AutoMALA.jl:73-75)
        factor_mean = reduced.extra_mean[:, 0]
        observed = np.isfinite(factor_mean)
        factor = float(np.mean(factor_mean[observed])) if observed.any() else 1.0
        new_step = state["step_size"] * jnp.float32(factor)
        std_devs = state["std_devs"]
        if self.preconditioner.adapts:
            std = np.sqrt(np.maximum(reduced.online_var[:-1], 0.0))
            n = std_devs.shape[0]
            std_devs = jnp.tile(jnp.asarray(std, jnp.float32)[None, :], (n, 1))
        return {"step_size": new_step, "std_devs": std_devs}

    # -- step-size search --------------------------------------------------

    def _auto_step_size(self, lp_fn, precond, x, v, lp, cgrad, base_step,
                        lower, upper):
        """Bounded grow/shrink search for the step-size exponent.

        ``cgrad`` is the conditioned gradient at ``x`` — computed ONCE per
        refresh, so each trial step costs a single gradient evaluation (at
        its proposal) instead of two. Returns
        ``(exponent, n_leapfrogs, candidate)`` where ``candidate`` is the
        leapfrog result AT THE SELECTED step size
        (``x', v', lp', cgrad', ok``): the caller's move reuses it instead of
        integrating again (grow selects one less than the last trial, so the
        candidate is the previous iterate; shrink selects the last)."""
        h_before = log_joint(lp, v)

        def try_step(eps):
            x_n, v_n, lp_n, g_n, ok = leapfrog1_cached(
                lp_fn, precond, x, v, eps, cgrad
            )
            diff = jnp.where(ok, log_joint(lp_n, v_n) - h_before, jnp.nan)
            return diff, (x_n, v_n, lp_n, g_n, ok)

        diff0, cand0 = try_step(base_step)
        shrink = ~jnp.isfinite(diff0) | (diff0 < lower)
        grow = jnp.isfinite(diff0) & (diff0 > upper)
        direction = jnp.where(grow, 1, jnp.where(shrink, -1, 0))

        def cond(carry):
            n, step, done, prev, cur = carry
            return ~done & (n < self.max_exponent)

        def body(carry):
            n, step, done, prev, cur = carry
            n = n + 1
            step = jnp.where(direction > 0, step * 2.0, step * 0.5)
            diff, cand = try_step(step)
            done_grow = (direction > 0) & (~jnp.isfinite(diff) | (diff < upper))
            done_shrink = (direction < 0) & jnp.isfinite(diff) & (diff > lower)
            return n, step, done_grow | done_shrink, cur, cand

        n, _, _, prev, cur = lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), base_step, direction == 0, cand0, cand0),
        )
        # grow returns n-1 (one less, avoiding the acceptance cliff); shrink -n
        exponent = jnp.where(direction > 0, n - 1, jnp.where(direction < 0, -n, 0))
        selected = jax.tree.map(
            lambda a, b: jnp.where(direction > 0, a, b), prev, cur
        )
        return exponent, (1 + n).astype(jnp.float32), selected

    # -- full step ---------------------------------------------------------

    def step(self, key, x, lp0, lp_fn, beta, chain_params, scan_idx) -> StepOut:
        n_refresh = self.n_refresh(x.shape[0])
        base_step = chain_params["step_size"]
        std_devs = chain_params["std_devs"]
        # the reference skips MH on the first scan of each round
        use_mh = jnp.asarray(scan_idx != 1)

        def refresh(i, carry):
            x, lp, raw_grad, a_s, a_n, ns, f_s, f_n, r_s, r_n = carry
            k = jax.random.fold_in(key, i)
            k_mom, k_prec, k_a, k_b, k_mh = jax.random.split(k, 5)
            precond = self.preconditioner.build(k_prec, std_devs)
            cgrad = raw_grad / precond  # start-point gradient: carried, free
            v = jax.random.normal(k_mom, x.shape, x.dtype)
            h0 = log_joint(lp, v)
            a = jax.random.uniform(k_a)
            b = jax.random.uniform(k_b)
            lower = jnp.log(jnp.minimum(a, b))
            upper = jnp.log(jnp.maximum(a, b))

            exp_fwd, n_fwd, cand = self._auto_step_size(
                lp_fn, precond, x, v, lp, cgrad, base_step, lower, upper
            )
            # the move IS the search's selected candidate — no extra leapfrog
            x_new, v_new, lp_new, cgrad_new, ok = cand
            f_s = f_s + 2.0**exp_fwd.astype(jnp.float32)
            f_n = f_n + 1.0
            ns = ns + n_fwd

            # reversibility check from the proposal with flipped momentum,
            # seeded by the candidate's own end-point gradient (free).
            # (The reference runs it only when MH is active; mask its stats so
            # the adaptation sees the same factor stream.)
            exp_rev, n_rev, _ = self._auto_step_size(
                lp_fn, precond, x_new, -v_new, lp_new, cgrad_new, base_step,
                lower, upper
            )
            reversible = (exp_rev == exp_fwd) & ok
            f_s = f_s + jnp.where(use_mh, 2.0**exp_rev.astype(jnp.float32), 0.0)
            f_n = f_n + jnp.where(use_mh, 1.0, 0.0)
            ns = ns + jnp.where(use_mh, n_rev, 0.0)

            h1 = log_joint(lp_new, v_new)
            pr = jnp.where(reversible, jnp.minimum(1.0, jnp.exp(h1 - h0)), 0.0)
            accept = use_mh & (jax.random.uniform(k_mh) < pr) | (~use_mh & ok)
            x = jnp.where(accept, x_new, x)
            lp = jnp.where(accept, lp_new, lp)
            # carry the RAW gradient of the new state (divided by the NEXT
            # refresh's preconditioner there); candidate gradients are
            # conditioned, so un-condition on accept
            raw_grad = jnp.where(accept, cgrad_new * precond, raw_grad)
            a_s = a_s + jnp.where(use_mh, pr, 0.0)
            a_n = a_n + jnp.where(use_mh, 1.0, 0.0)
            r_s = r_s + jnp.where(use_mh, reversible.astype(jnp.float32), 0.0)
            r_n = r_n + jnp.where(use_mh, 1.0, 0.0)
            return x, lp, raw_grad, a_s, a_n, ns, f_s, f_n, r_s, r_n

        z = jnp.zeros((), jnp.float32)
        lp_start, cgrad0 = value_and_cond_grad(lp_fn, x, jnp.ones_like(x))
        del lp_start  # lp0 is the carried density; one gradient seeds the scan
        x, lp, _, a_s, a_n, ns, f_s, f_n, r_s, r_n = lax.fori_loop(
            0, n_refresh, refresh, (x, lp0, cgrad0, z, z, z + 1.0, z, z, z, z)
        )
        return StepOut(
            x, lp, a_s, a_n, ns,
            extras_sum=jnp.stack([f_s, r_s]),
            extras_n=jnp.stack([f_n, r_n]),
        )

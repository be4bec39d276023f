"""Coordinate-wise slice sampler (Neal 2003) with doubling + shrinking.

Reference semantics: ``src/explorers/SliceSampler.jl`` — per coordinate:
vertical draw z = lp - Exp(1); doubling scheme expanding the bracket at most
``p`` times (``slice_double``, ``:97-126``); shrinkage with the doubling
validity check (``slice_accept``, ``:192-237``); the log potential is cached
between coordinate moves (``:24-30``). Defaults w=10, p=20, n_passes=3,
max_iter=1024 (``:8-20``).

TPU-first notes: written for a SINGLE replica with ``lax.while_loop`` /
``fori_loop`` only (static bounds), so the runtime can ``vmap`` it across the
replica batch — batched lanes run lockstep with masking, so the per-scan
latency is set by the slowest lane. Unlike the reference, the doubling
validity check refreshes endpoint log densities eagerly each halving step
(one eval per iteration): under vmap the lazy-staleness bookkeeping of the
reference buys nothing, since masked lanes execute anyway. Continuous (float)
coordinates only for now — the reference's Bool/Integer coordinate
special-cases (``:65-86,136-142``) are not yet implemented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .base import Explorer, StepOut


class SliceSampler(Explorer):
    def __init__(self, w: float = 10.0, p: int = 20, n_passes: int = 3, max_iter: int = 1024):
        self.w = float(w)
        self.p = int(p)
        self.n_passes = int(n_passes)
        self.max_iter = int(max_iter)

    # -- single coordinate update ------------------------------------------

    def _coord_step(self, key, x, c, cached_lp, lp_fn):
        w, p = self.w, self.p
        f = cached_lp.dtype

        def lp_at(v):
            return lp_fn(x.at[c].set(v))

        k_z, k_init, k_dbl, k_shr = jax.random.split(key, 4)
        z = cached_lp - jax.random.exponential(k_z, dtype=f)
        old = x[c]

        # --- doubling (slice_double) ---
        L = old - w * jax.random.uniform(k_init, dtype=f)
        R = L + w
        lp_L = lp_at(L)
        lp_R = lp_at(R)

        def dbl_cond(carry):
            L, R, lp_L, lp_R, K, key = carry
            return (K > 0) & ((z < lp_L) | (z < lp_R))

        def dbl_body(carry):
            L, R, lp_L, lp_R, K, key = carry
            key, sub = jax.random.split(key)
            grow_left = jax.random.uniform(sub, dtype=f) <= 0.5
            span = R - L
            L_new = jnp.where(grow_left, L - span, L)
            R_new = jnp.where(grow_left, R, R + span)
            lp_new = lp_at(jnp.where(grow_left, L_new, R_new))
            lp_L = jnp.where(grow_left, lp_new, lp_L)
            lp_R = jnp.where(grow_left, lp_R, lp_new)
            return (L_new, R_new, lp_L, lp_R, K - 1, key)

        L, R, lp_L, lp_R, K, _ = lax.while_loop(
            dbl_cond, dbl_body, (L, R, lp_L, lp_R, jnp.asarray(p), k_dbl)
        )
        n_doublings = (p - K).astype(jnp.float32)

        # --- doubling validity check (slice_accept), eager-refresh variant ---
        def acceptable(new_pos):
            def acc_cond(carry):
                Lh, Rh, lp_Lh, lp_Rh, rejected, done, ne = carry
                return (~done) & (Rh - Lh > 1.1 * w)

            def acc_body(carry):
                Lh, Rh, lp_Lh, lp_Rh, rejected, done, ne = carry
                M = 0.5 * (Lh + Rh)
                crossed = ((old < M) & (new_pos >= M)) | ((old >= M) & (new_pos < M))
                take_left = new_pos < M
                Lh_n = jnp.where(take_left, Lh, M)
                Rh_n = jnp.where(take_left, M, Rh)
                lp_M = lp_at(M)
                lp_Lh_n = jnp.where(take_left, lp_Lh, lp_M)
                lp_Rh_n = jnp.where(take_left, lp_M, lp_Rh)
                rej = crossed & (z >= lp_Lh_n) & (z >= lp_Rh_n)
                return (Lh_n, Rh_n, lp_Lh_n, lp_Rh_n, rejected | rej, rej, ne + 1.0)

            _, _, _, _, rejected, _, n_evals = lax.while_loop(
                acc_cond,
                acc_body,
                (L, R, lp_L, lp_R, jnp.asarray(False), jnp.asarray(False),
                 jnp.zeros((), jnp.float32)),
            )
            return ~rejected, n_evals

        # --- shrinkage (slice_shrink!) ---
        # carry: (key, Lbar, Rbar, pos, lp, done, n, acc_sum, acc_n, n_evals)
        def shr_cond(carry):
            key, Lb, Rb, pos, lp, done, n, a_s, a_n, ne = carry
            return (~done) & (n <= self.max_iter)

        def shr_body(carry):
            key, Lb, Rb, pos, lp, done, n, a_s, a_n, ne = carry
            key, sub = jax.random.split(key)
            new = Lb + jax.random.uniform(sub, dtype=f) * (Rb - Lb)
            lp_new = lp_at(new)
            accept_ok, acc_evals = acceptable(new)
            consider = z < lp_new
            # count only algorithmically-required evals (the serial reference
            # runs the validity check only when the vertical test passes)
            ne = ne + 1.0 + jnp.where(consider, acc_evals, 0.0)
            ok = consider & accept_ok
            # on acceptance, move; otherwise shrink the bracket toward `new`
            pos_n = jnp.where(ok, new, pos)
            lp_n = jnp.where(ok, lp_new, lp)
            shrink_left = new < old
            Lb_n = jnp.where(ok | ~shrink_left, Lb, new)
            Rb_n = jnp.where(ok | shrink_left, Rb, new)
            # degenerate bracket: bail out at the old position (reference
            # SliceSampler.jl:160-166, rtol ~ sqrt(eps) for the state dtype)
            rtol = jnp.asarray(3.5e-4 if f == jnp.float32 else 1.5e-8, f)
            degenerate = jnp.abs(Rb_n - Lb_n) <= rtol * jnp.maximum(
                jnp.abs(Lb_n), jnp.abs(Rb_n)
            )
            done_n = ok | degenerate
            a_s = a_s + jnp.where(ok, 1.0, 0.0)
            a_n = a_n + jnp.where(consider, 1.0, 0.0)
            return (key, Lb_n, Rb_n, pos_n, lp_n, done_n, n + 1, a_s, a_n, ne)

        init = (
            k_shr,
            L,
            R,
            old,
            cached_lp,
            jnp.asarray(False),
            jnp.asarray(1),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        _, _, _, pos, lp, _, _, acc_sum, acc_n, n_shrink_evals = lax.while_loop(
            shr_cond, shr_body, init
        )
        x_new = x.at[c].set(pos)
        # n_steps counts log-density evaluations: 2 bracket-endpoint inits,
        # one per doubling, then shrink draws + validity-check midpoints
        n_steps = 2.0 + n_doublings + n_shrink_evals
        return x_new, lp, acc_sum, acc_n, n_steps

    # -- full step -----------------------------------------------------------

    def step(self, key, x, lp0, lp_fn, beta, chain_params, scan_idx) -> StepOut:
        d = x.shape[0]

        def one_pass(p_idx, carry):
            x, lp, a_s, a_n, steps = carry
            k_pass = jax.random.fold_in(key, p_idx)

            def one_coord(c, carry2):
                x, lp, a_s, a_n, steps = carry2
                k_c = jax.random.fold_in(k_pass, c)
                x, lp, da_s, da_n, dsteps = self._coord_step(k_c, x, c, lp, lp_fn)
                return (x, lp, a_s + da_s, a_n + da_n, steps + dsteps)

            return lax.fori_loop(0, d, one_coord, (x, lp, a_s, a_n, steps))

        z = jnp.zeros((), jnp.float32)
        x, lp, a_s, a_n, steps = lax.fori_loop(
            0, self.n_passes, one_pass, (x, lp0, z, z, z)
        )
        return StepOut(x, lp, a_s, a_n, steps)

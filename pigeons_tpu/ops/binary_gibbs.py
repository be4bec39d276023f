"""Exact Gibbs updates for binary coordinates.

Reference semantics (``src/explorers/SliceSampler.jl:65-86``): Bool
coordinates are not sliced — the full conditional is computed exactly from
one extra density evaluation (p(x_c = 1) = 1 / (1 + exp(lp0 - lp1))) and
sampled directly.

States remain float vectors with binary coordinates encoded as {0., 1.}; an
optional mask restricts updates to the binary dims so BinaryGibbs can be
``Compose``d with a continuous explorer for mixed models.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .base import Explorer, StepOut


class BinaryGibbs(Explorer):
    def __init__(self, mask: Optional[Sequence[int]] = None, n_passes: int = 1):
        """``mask``: optional 0/1 per-dimension flags marking binary dims
        (default: all dims binary)."""
        self.mask = None if mask is None else tuple(int(m) for m in mask)
        self.n_passes = int(n_passes)

    def step(self, key, x, lp0, lp_fn, beta, chain_params, scan_idx) -> StepOut:
        d = x.shape[0]
        mask = (
            jnp.ones((d,), bool)
            if self.mask is None
            else jnp.asarray(self.mask, bool)
        )

        def one_pass(p_idx, carry):
            x, lp, n_evals = carry
            k_pass = jax.random.fold_in(key, p_idx)

            def one_coord(c, carry2):
                x, lp, n_evals = carry2
                on = mask[c]
                cur = x[c]
                # one extra eval for the flipped value; `lp` caches the current
                x_flip = x.at[c].set(1.0 - cur)
                lp_flip = lp_fn(x_flip)
                lp1 = jnp.where(cur > 0.5, lp, lp_flip)
                lp0v = jnp.where(cur > 0.5, lp_flip, lp)
                p_zero = 1.0 / (1.0 + jnp.exp(lp1 - lp0v))
                u = jax.random.uniform(jax.random.fold_in(k_pass, c))
                new = jnp.where(u < p_zero, 0.0, 1.0)
                x_new = jnp.where(on, x.at[c].set(new), x)
                lp_new = jnp.where(
                    on, jnp.where(new == cur, lp, lp_flip), lp
                )
                return x_new, lp_new, n_evals + jnp.where(on, 1.0, 0.0)

            return lax.fori_loop(0, d, one_coord, (x, lp, n_evals))

        z = jnp.zeros((), jnp.float32)
        x, lp, n_evals = lax.fori_loop(0, self.n_passes, one_pass, (x, lp0, z))
        return StepOut(x, lp, z, z, n_evals)

"""Stan <-> library posterior-parity battery (VERDICT r4 item 8): every
reference ``.stan`` example model runs through the Stan compiler AND its
hand-written ``models/library.py`` twin, and the two must agree — the
analogue of the reference's cross-frontend agreement test
(``test/test_turing_stan_agree.jl``).

Two layers, the first strictly stronger than what the reference can do:

1. **Pointwise density agreement.** Both frontends share the same
   unconstrained parameterization for every model, so the compiled Stan
   density is compared DIRECTLY against the hand-written density at random
   points (the reference's Julia/Stan runtimes cannot be diffed this way —
   it must infer agreement from posterior draws). Agreement here implies
   identical posteriors mathematically.
2. **End-to-end sampling agreement.** Both targets run PT under the SAME
   reference distribution (the library twin's — so the annealing path, and
   hence barriers and logZ estimators, coincide) and must agree on
   normalization constants, posterior moments, and the global barrier
   within MC-error tolerances. Hard geometries (banana, funnel, mRNA) get
   wider bands: at this test budget their tails are genuinely unconverged
   in BOTH frontends, and layer 1 already proves the densities identical.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeons_tpu import Inputs, PT, stan_target
from pigeons_tpu.models import library
from pigeons_tpu.models.stan import load_stan_data

REF_STAN = "/root/reference/examples/stan"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_STAN), reason="reference examples not present"
)


def _mrna_data():
    ts, ys = library._load_mrna_data()
    return {"N": len(ts), "ts": ts, "ys": ys}


_CASES = {
    # name -> (stan data thunk, library factory, e2e tolerances or None)
    "mvn": (
        lambda: {"dim": 3, "precision": 2.0},
        lambda: library.mvn_target(3, 2.0),
        dict(mean=0.2, var=0.35, logz=0.35, barrier=0.5),
    ),
    "unid": (
        lambda: {"n_trials": 100, "n_successes": 50},
        lambda: library.unid_target(100, 50),
        # the unid posterior is an unidentifiable RIDGE (p1*p2 ~ 1/2):
        # coordinate means wander along it with huge MC variance, so the
        # identifiable anchor is the ANALYTIC logZ, demanded of both runs
        dict(mean=None, var=None, logz=0.4, barrier=0.5,
             logz_analytic=library.unid_analytic_log_z(100, 50)),
    ),
    "bernoulli": (
        lambda: load_stan_data(f"{REF_STAN}/bernoulli.data.json"),
        lambda: library.bernoulli_target(),
        dict(mean=0.25, var=0.35, logz=0.3, barrier=0.5),
    ),
    "eight_schools_centered": (
        lambda: load_stan_data(f"{REF_STAN}/eight_schools.json"),
        lambda: library.eight_schools(centered=True),
        dict(mean=2.0, var=None, logz=1.5, barrier=0.8),
    ),
    "eight_schools_noncentered": (
        lambda: load_stan_data(f"{REF_STAN}/eight_schools.json"),
        lambda: library.eight_schools(centered=False),
        dict(mean=2.0, var=None, logz=1.5, barrier=0.8),
    ),
    "funnel": (
        lambda: {"dim": 3, "scale": 1.0},
        lambda: library.funnel(3, 1.0),
        # compare only the y coordinate: the funnel's x marginals have
        # Var = E[e^(2y)] = e^18 — sample moments are dominated by rare
        # deep-funnel excursions at ANY budget, in both frontends alike
        dict(mean=0.8, var=None, logz=1.5, barrier=1.0, coords=(0,)),
    ),
    "banana": (
        lambda: {"dim": 3, "scale": 1.0},
        lambda: library.banana(3, 1.0),
        dict(mean=3.0, var=None, logz=4.0, barrier=1.5),
    ),
    "mRNA": (
        _mrna_data,
        lambda: library.mrna_target(),
        # a small e2e proves both frontends sample and see the same path
        # geometry; layer 1 already proves the densities identical
        # pointwise. Slice sampler for both: AutoMALA's cold-start step-size
        # search is pathologically deep on this density's ~1e7 scale.
        dict(mean=None, var=None, logz=None, barrier=2.5, n_rounds=6,
             slice=True),
    ),
}


@needs_ref
@pytest.mark.parametrize("name", sorted(_CASES))
def test_stan_and_library_densities_agree_pointwise(name):
    """Layer 1: the compiled .stan density equals the hand-written twin at
    random unconstrained points UP TO A CONSTANT, to f32 accumulation error
    — equality up to a constant is exactly 'identical posterior'. (A genuine
    constant does occur: Stan's propto=false half-Cauchy keeps the full
    Cauchy normalizer, the library's HalfCauchy the x2-normalized one, so
    eight-schools differs by exactly log 2 per tau.)"""
    data_fn, lib_factory, _ = _CASES[name]
    t_stan = stan_target(file=f"{REF_STAN}/{name}.stan", data=data_fn())
    t_lib = lib_factory()
    assert t_stan.dim == t_lib.dim, (name, t_stan.dim, t_lib.dim)
    key = jax.random.key(hash(name) % 2**31)
    radius, atol = (0.4, 2e-3) if name == "mRNA" else (0.8, 2e-4)
    xs = radius * jax.random.normal(key, (50, t_stan.dim))
    lp_s = np.asarray(jax.vmap(t_stan.log_density)(xs), np.float64)
    lp_l = np.asarray(jax.vmap(t_lib.log_density)(xs), np.float64)
    finite = np.isfinite(lp_s) & np.isfinite(lp_l)
    assert finite.mean() > 0.9, name  # both reject the same tiny fraction
    diffs = lp_s[finite] - lp_l[finite]
    offset = float(np.median(diffs))
    # a convention constant, not a bug: e.g. mRNA differs by exactly
    # sum(log(width)) = 9.393 of its bounded-uniform priors (the .stan file
    # leaves them implicit in the constraints; the DSL's Uniform includes
    # the normalizer), eight-schools by log 2 (half-Cauchy)
    assert abs(offset) < 12.0, (name, offset)
    scale = np.maximum(1.0, np.abs(lp_l[finite]))
    np.testing.assert_allclose(
        (diffs - offset) / scale, 0.0, atol=atol, err_msg=name
    )


def _run(target, seed, reference, n_rounds=9, explorer=None):
    pt = PT(
        Inputs(
            target=target,
            n_chains=8,
            n_rounds=n_rounds,
            seed=seed,
            reference=reference,
            explorer=explorer,
            show_report=False,
        )
    )
    pt.run()
    return pt


def _constrained_means(target, pt):
    cs = target.constrained_samples(pt)
    return {k: np.asarray(v).reshape(len(v), -1).mean(axis=0) for k, v in cs.items()}


@needs_ref
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_CASES))
def test_stan_and_library_posteriors_agree(name):
    """Layer 2: end-to-end PT agreement under a SHARED reference (the
    library twin's default), so barriers/logZ estimate the same quantities."""
    data_fn, lib_factory, tol = _CASES[name]
    t_stan = stan_target(file=f"{REF_STAN}/{name}.stan", data=data_fn())
    t_lib = lib_factory()
    reference = t_lib.default_reference()
    n_rounds = tol.get("n_rounds", 9)
    explorer = None
    if tol.get("slice"):
        from pigeons_tpu import SliceSampler

        explorer = SliceSampler(n_passes=1)
    pt_s = _run(t_stan, seed=1, reference=reference, n_rounds=n_rounds,
                explorer=explorer)
    pt_l = _run(t_lib, seed=2, reference=reference, n_rounds=n_rounds,
                explorer=explorer)

    lz_s = pt_s.reports[-1].log_z_estimate
    lz_l = pt_l.reports[-1].log_z_estimate
    assert np.isfinite(lz_s) and np.isfinite(lz_l), name
    if tol["logz"] is not None:
        assert abs(lz_s - lz_l) < tol["logz"], (name, lz_s, lz_l)
    if tol.get("logz_analytic") is not None:
        want = tol["logz_analytic"]
        assert abs(lz_s - want) < 0.3, (name, lz_s, want)
        assert abs(lz_l - want) < 0.3, (name, lz_l, want)

    if tol["mean"] is not None:
        if hasattr(t_stan, "constrained_samples") and hasattr(
            t_lib, "constrained_samples"
        ):
            ms = _constrained_means(t_stan, pt_s)
            ml = _constrained_means(t_lib, pt_l)
            shared = sorted(set(ms) & set(ml))
            assert shared, f"{name}: no shared constrained parameter names"
            for k in shared:
                np.testing.assert_allclose(
                    ms[k], ml[k], atol=tol["mean"], err_msg=f"{name}:{k}"
                )
        else:
            coords = list(tol.get("coords", range(t_stan.dim)))
            np.testing.assert_allclose(
                np.asarray(pt_s.mean())[coords],
                np.asarray(pt_l.mean())[coords],
                atol=tol["mean"], err_msg=name,
            )
    if tol["var"] is not None:
        coords = list(tol.get("coords", range(t_stan.dim)))
        np.testing.assert_allclose(
            np.asarray(pt_s.var())[coords],
            np.asarray(pt_l.var())[coords],
            atol=tol["var"], err_msg=name,
        )

    # same path (shared reference) => same barrier, within estimation error
    assert (
        abs(pt_s.global_barrier - pt_l.global_barrier) < tol["barrier"]
    ), (name, pt_s.global_barrier, pt_l.global_barrier)

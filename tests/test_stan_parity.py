"""Stan <-> library posterior-parity battery (VERDICT r4 item 8): every
reference ``.stan`` example model runs end-to-end through the Stan compiler
AND through its hand-written ``models/library.py`` twin, and the two runs
must agree on normalization constants and posterior moments — the analogue
of the reference's cross-frontend agreement test
(``test/test_turing_stan_agree.jl``).

Both frontends share the same unconstrained parameterization for every model
(identity for funnel/banana/mvn, logit for unid/bernoulli, log for tau,
scaled-logit for mRNA's bounded log10 parameters), so unconstrained moments
are directly comparable where sampled coordinates line up, and constrained
draws are compared by shared parameter name otherwise.
"""

import os

import numpy as np
import pytest

from pigeons_tpu import Inputs, PT, stan_target
from pigeons_tpu.models import library
from pigeons_tpu.models.stan import load_stan_data

REF_STAN = "/root/reference/examples/stan"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_STAN), reason="reference examples not present"
)


def _run(target, seed, n_rounds=9, n_chains=6):
    pt = PT(
        Inputs(
            target=target,
            n_chains=n_chains,
            n_rounds=n_rounds,
            seed=seed,
            show_report=False,
        )
    )
    pt.run()
    return pt


def _constrained_means(target, pt):
    cs = target.constrained_samples(pt)
    return {k: np.asarray(v).reshape(len(v), -1).mean(axis=0) for k, v in cs.items()}


_CASES = {
    # name -> (stan data, library factory, comparison mode, tolerances)
    "mvn": (
        {"dim": 3, "precision": 2.0},
        lambda: library.mvn_target(3, 2.0),
        "unconstrained",
        dict(mean=0.15, var=0.3, logz=0.35),
    ),
    "funnel": (
        {"dim": 3, "scale": 1.0},
        lambda: library.funnel(3, 1.0),
        "unconstrained",
        dict(mean=0.5, var=1.5, logz=0.5),
    ),
    "banana": (
        {"dim": 3, "scale": 1.0},
        lambda: library.banana(3, 1.0),
        "unconstrained",
        dict(mean=0.5, var=1.2, logz=0.5),
    ),
    "unid": (
        {"n_trials": 100, "n_successes": 50},
        lambda: library.unid_target(100, 50),
        "unconstrained",
        dict(mean=0.25, var=0.4, logz=0.3),
    ),
    "bernoulli": (
        "data.json",
        lambda: library.bernoulli_target(),
        "unconstrained",
        dict(mean=0.2, var=0.3, logz=0.3),
    ),
    "eight_schools_centered": (
        "eight_schools.json",
        lambda: library.eight_schools(centered=True),
        "constrained",
        dict(mean=1.2, logz=0.8),
    ),
    "eight_schools_noncentered": (
        "eight_schools.json",
        lambda: library.eight_schools(centered=False),
        "constrained",
        dict(mean=1.2, logz=0.8),
    ),
    "mRNA": (
        None,  # built below from the library's CSV
        lambda: library.mrna_target(),
        "constrained",
        dict(mean=1.0, logz=1.5),
    ),
}


@needs_ref
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_CASES))
def test_stan_and_library_posteriors_agree(name):
    data, lib_factory, mode, tol = _CASES[name]
    if name == "bernoulli":
        data = load_stan_data(f"{REF_STAN}/bernoulli.data.json")
    elif isinstance(data, str):
        data = load_stan_data(f"{REF_STAN}/{data}")
    elif name == "mRNA":
        ts, ys = library._load_mrna_data()
        data = {"N": len(ts), "ts": ts, "ys": ys}

    t_stan = stan_target(file=f"{REF_STAN}/{name}.stan", data=data)
    t_lib = lib_factory()
    pt_s = _run(t_stan, seed=1)
    pt_l = _run(t_lib, seed=2)

    # the two frontends compile the SAME unnormalized density, so the
    # stepping-stone estimates must agree within MC error (reference
    # test_stepping_stone.jl tolerance band)
    lz_s = pt_s.reports[-1].log_z_estimate
    lz_l = pt_l.reports[-1].log_z_estimate
    assert np.isfinite(lz_s) and np.isfinite(lz_l), name
    assert abs(lz_s - lz_l) < tol["logz"], (name, lz_s, lz_l)

    if mode == "unconstrained":
        # identical coordinate layouts: compare directly
        np.testing.assert_allclose(pt_s.mean(), pt_l.mean(), atol=tol["mean"])
        np.testing.assert_allclose(pt_s.var(), pt_l.var(), atol=tol["var"])
    else:
        ms = _constrained_means(t_stan, pt_s)
        ml = _constrained_means(t_lib, pt_l)
        shared = sorted(set(ms) & set(ml))
        assert shared, f"{name}: no shared constrained parameter names"
        for k in shared:
            np.testing.assert_allclose(
                ms[k], ml[k], atol=tol["mean"], err_msg=f"{name}:{k}"
            )

    # path geometry agrees: the barrier is a property of the density alone
    assert abs(pt_s.global_barrier - pt_l.global_barrier) < 0.6, name

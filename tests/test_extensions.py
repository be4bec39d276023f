"""ExternalTarget (host-callback bridge), LazyTarget, custom extractors,
diagnostics (reference StreamTarget/LazyTarget/extractor/MCMCChains analogues)."""

import pickle

import jax.numpy as jnp
import numpy as np

from pigeons_tpu import (
    ExternalTarget,
    LazyTarget,
    ess,
    pigeons,
    reports_dataframe,
    split_rhat,
    summary,
    swap_prs_dataframe,
    toy_mvn_target,
)
from pigeons_tpu.models import register_lazy_target


def test_external_target():
    """Batched host-callback log density (the StreamTarget analogue)."""
    et = ExternalTarget(
        lambda xb: (-0.5 * (xb**2).sum(axis=1) * 5.0).astype("float32"), dim=2
    )
    pt = pigeons(target=et, n_chains=3, n_rounds=7, seed=1, show_report=False)
    np.testing.assert_allclose(pt.var(), 0.2, atol=0.07)


def test_lazy_target():
    register_lazy_target("toy3-test", lambda: toy_mvn_target(3))
    lt = LazyTarget("toy3-test")
    assert len(pickle.dumps(lt)) < 200  # only the flag is serialized
    pt = pigeons(target=lt, n_chains=3, n_rounds=6, seed=1, show_report=False)
    np.testing.assert_allclose(pt.var(), 0.1, atol=0.06)


def test_custom_extractor():
    pt = pigeons(
        target=toy_mvn_target(3), n_chains=4, n_rounds=6, seed=1, show_report=False,
        extractor=lambda x, lp: jnp.array([jnp.sum(x**2), lp]),
    )
    arr = pt.sample_array()
    assert arr.shape[1] == 2
    # E[|x|^2] under the target = 3 * 0.1
    assert abs(arr[:, 0].mean() - 0.3) < 0.1


def test_diagnostics():
    pt = pigeons(target=toy_mvn_target(2), n_chains=4, n_rounds=7, seed=1,
                 show_report=False)
    df = summary(pt)
    assert list(df["variable"])[-1] == "log_density"
    assert (df["ess"] > 1).all()
    rep = reports_dataframe(pt)
    assert len(rep) == 7 and "global_barrier" in rep.columns
    swaps = swap_prs_dataframe(pt)
    assert len(swaps) == 3
    # iid standard normal has ESS ~ n and rhat ~ 1
    iid = np.random.default_rng(0).normal(size=2000)
    assert ess(iid) > 500  # Geyer estimator is conservative on finite iid samples
    assert split_rhat(np.random.default_rng(1).normal(size=(4, 500))) < 1.02


def test_pt_sample_names():
    """Reference ``sample_names(pt)`` (``src/pt/state.jl:60``): target-
    declared names when available, positional x[i] fallback, log_density
    last."""
    import pigeons_tpu as pg

    pt = pg.pigeons(
        target=pg.toy_mvn_target(3), n_chains=3, n_rounds=2, seed=1,
        show_report=False,
    )
    assert pt.sample_names() == ["x[0]", "x[1]", "x[2]", "log_density"]
    pt2 = pg.pigeons(
        target=pg.eight_schools(), n_chains=3, n_rounds=2, seed=1,
        explorer=pg.SliceSampler(n_passes=1), show_report=False,
    )
    names = pt2.sample_names()
    assert names[0] == "theta_trans[0]" and names[-1] == "log_density"
    assert len(names) == pt2.sample_array().shape[1]

"""Stream-protocol bridge tests (reference ``test/test_blang_bridge.jl`` —
here against the pure-Python demo worker, since no JVM is in the image).

The demo worker implements the same scaled-precision Gaussian path as
``toy_mvn_target``, so the run is checked against the analytic oracles: the
recorded log densities must match a chi-square moment, and round trips must
accumulate (workers answer at every beta, reference chain regenerates iid).
"""

import sys

import numpy as np
import pytest

import pigeons_tpu as pg
from pigeons_tpu.models.stream import StreamTarget, _Worker, java_seed


def demo_command(dim=2, extra=()):
    def build(replica_index: int):
        return [
            sys.executable,
            "-m",
            "pigeons_tpu.models.stream_worker_demo",
            "--seed",
            str(java_seed(1, replica_index)),
            "--dim",
            str(dim),
            *extra,
        ]

    return build


def test_worker_protocol_roundtrip():
    w = _Worker(demo_command()(0), echo=False)
    try:
        lp = float(w.invoke("log_potential(0.0)"))
        assert np.isfinite(lp) and lp <= 0.0
        assert w.invoke("call_sampler!(0.5)") == ""
        lp1 = float(w.invoke("log_potential(1.0)"))
        assert np.isfinite(lp1)
    finally:
        w.close()


@pytest.mark.slow
def test_stream_target_run():
    target = StreamTarget(demo_command(dim=2))
    try:
        pt = pg.pigeons(target=target, n_chains=4, n_rounds=7, show_report=False)
        # traces carry [dummy_x, log_density]; at the target (beta=1, prec=10,
        # d=2) the log density is -chi^2_2/2, mean -1.0
        lps = pt.sample_array()[:, -1]
        assert np.isfinite(lps).all()
        assert abs(lps.mean() + 1.0) < 0.25
        assert pt.n_round_trips > 0
        # schedule adaptation ran on worker-computed densities
        assert pt.global_barrier > 0.0
    finally:
        target.close()


def test_stream_seeds_differ_per_replica():
    assert java_seed(1, 0) != java_seed(1, 1)
    assert java_seed(1, 0) == java_seed(1, 0)
    assert java_seed(1, 5) > 0


@pytest.mark.parametrize("cls", [pg.BlangTarget, pg.TreePPLTarget])
def test_ecosystem_builders_construct(cls):
    t = cls(["java", "my.Model"], seed=3)
    assert t.dim == 1
    t.close()

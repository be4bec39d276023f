"""Extended traces, disk recorder, process_sample, and plots
(reference test/test_traces.jl, test_recorders.jl)."""

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")

from pigeons_tpu import pigeons, toy_mvn_target
from pigeons_tpu.checkpoint import process_sample
from pigeons_tpu.inputs import RECORD_DEFAULT
from pigeons_tpu.plots import plot_cumulative_barrier, plot_index_process, plot_local_barrier


def run(tmp_path, **kw):
    base = dict(
        target=toy_mvn_target(2), n_chains=4, n_rounds=4, seed=1, show_report=False,
        checkpoint=True, checkpoint_folder=str(tmp_path / "run"),
    )
    base.update(kw)
    return pigeons(**base)


def test_extended_traces(tmp_path):
    pt = run(tmp_path, extended_traces=True)
    ext = pt.extended_sample_array()
    assert ext.shape == (16, 4, 3)
    # the target chain's column matches the pooled target trace
    target_col = ext[:, 3, :]
    np.testing.assert_array_equal(target_col, pt.sample_array())


def test_disk_recorder_and_process_sample(tmp_path):
    pt = run(tmp_path, record=RECORD_DEFAULT + ("disk",))
    rows = list(process_sample(pt.exec_folder))
    assert len(rows) == 2 + 4 + 8 + 16
    last = np.stack([r[2] for r in rows if r[0] == 4])
    np.testing.assert_array_equal(last, pt.sample_array())
    # single-round streaming
    r3 = list(process_sample(pt.exec_folder, round_idx=3))
    assert len(r3) == 8


def test_plots(tmp_path):
    pt = run(tmp_path, record=RECORD_DEFAULT + ("index_process",))
    assert plot_index_process(pt) is not None
    assert plot_local_barrier(pt) is not None
    assert plot_cumulative_barrier(pt) is not None


def test_kahan_accumulator_exact_counts():
    """Past 2^24, plain f32 addition silently drops +1 increments; the
    compensated accumulator must keep exact integer counts (the reference
    gets this from Float64 OnlineStats, recorder.jl:93-102)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pigeons_tpu.recorders import kadd, kinit

    n_start = 16_777_216  # 2^24: f32 integer cliff
    acc = jnp.stack([jnp.float32(n_start), jnp.float32(0.0)])

    def body(_, a):
        return kadd(a, jnp.float32(1.0))

    steps = 4096
    acc = jax.lax.fori_loop(0, steps, body, acc)
    total = float(np.float64(acc[0]) - np.float64(acc[1]))
    assert total == n_start + steps  # plain f32 would still be 2^24
    plain = jnp.float32(n_start)
    for _ in range(4):
        plain = plain + jnp.float32(1.0)
    assert float(plain) == n_start  # demonstrates the cliff being fixed


def test_kahan_accumulator_tracks_f64():
    """Sum of 10^5 O(1) values: compensated f32 must stay within ~1e-5
    relative of the f64 truth (plain f32 drifts ~1e-2 at this length)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pigeons_tpu.recorders import kadd

    rng = np.random.default_rng(0)
    vals = rng.normal(loc=1.0, size=100_000).astype(np.float32)

    acc = jnp.stack([jnp.float32(0.0), jnp.float32(0.0)])
    acc = jax.lax.fori_loop(
        0, len(vals), lambda i, a: kadd(a, jnp.asarray(vals)[i]), acc
    )
    got = float(np.float64(acc[0]) - np.float64(acc[1]))
    truth = float(np.sum(vals.astype(np.float64)))
    assert abs(got - truth) / abs(truth) < 1e-5


def test_profiler_hook_writes_trace(tmp_path):
    """Inputs.profile_round captures a JAX profiler trace per round under the
    exec folder (SURVEY §5 tracing subsystem)."""
    import os

    import pigeons_tpu as pg

    pt = pg.pigeons(
        target=pg.toy_mvn_target(2),
        n_chains=2,
        n_rounds=2,
        seed=1,
        show_report=False,
        checkpoint=True,
        checkpoint_folder=str(tmp_path / "run"),
        profile_round=2,
    )
    prof = os.path.join(pt.exec_folder, "profile", "round=2")
    assert os.path.isdir(prof) and any(os.scandir(prof))


def test_record_gating_zero_cost_and_identical_trajectory():
    """Disabled recorders are never traced into the kernel (reference
    @record_if_requested! is zero-cost when absent) and MUST NOT perturb the
    run's trajectory: states and chain permutations agree bitwise between a
    full-record run and a record=() run of the same Inputs."""
    from pigeons_tpu import Inputs, PT, SliceSampler
    from pigeons_tpu.inputs import RECORD_ALL

    def make(record):
        return PT(
            Inputs(
                target=toy_mvn_target(3),
                n_chains=4,
                n_rounds=4,
                seed=9,
                record=record,
                explorer=SliceSampler(n_passes=1),
                show_report=False,
            )
        )

    full = make(RECORD_ALL)
    full.run()
    bare = make(())
    bare.run()

    np.testing.assert_array_equal(np.asarray(full.states), np.asarray(bare.states))
    np.testing.assert_array_equal(
        np.asarray(full.chain_of), np.asarray(bare.chain_of)
    )
    # gated recorders report their disabled values
    assert bare.traces is None
    assert bare.n_round_trips == 0 and full.n_round_trips >= 0
    assert np.isnan(bare.reports[-1].log_z_estimate)
    assert np.isfinite(full.reports[-1].log_z_estimate)
    assert np.all(np.isnan(bare.reduced.energy_ac1))
    # swap acceptance (schedule adaptation) stays on in both
    assert np.isfinite(bare.reduced.accept_mean).any()
    # schedules adapted identically (adaptation inputs were never gated)
    np.testing.assert_array_equal(full.schedule.grids, bare.schedule.grids)


def test_record_gating_keeps_online_for_adapting_preconditioner():
    """An explorer whose preconditioner re-estimates scales from the online
    variance keeps the online recorder alive even when the user's record
    tuple omits it (reference recorders.jl:63-70 union semantics)."""
    from pigeons_tpu import AutoMALA, Inputs, PT

    pt = PT(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=3,
            n_rounds=3,
            seed=2,
            record=(),
            explorer=AutoMALA(),
            show_report=False,
        )
    )
    pt.run()
    assert pt._record_online
    assert np.isfinite(pt.reduced.online_var).all()
    assert pt.traces is None  # traces still gated off


def test_gated_moments_and_traces_raise_clearly():
    """mean()/var()/sample_array() must not silently return zeros when their
    recorders are gated off via Inputs.record (code-review r4)."""
    import pytest

    from pigeons_tpu import Inputs, PT, SliceSampler

    pt = PT(
        Inputs(
            target=toy_mvn_target(2), n_chains=3, n_rounds=2, seed=1,
            record=(), explorer=SliceSampler(n_passes=1), show_report=False,
        )
    )
    pt.run()
    with pytest.raises(RuntimeError, match="online"):
        pt.mean()
    with pytest.raises(RuntimeError, match="traces"):
        pt.sample_array()


def test_unknown_recorder_rejected_at_construction():
    """run_round() users never reach preflight_checks, so PT.__init__ itself
    validates Inputs.record (code-review r4)."""
    import pytest

    from pigeons_tpu import Inputs, PT

    with pytest.raises(ValueError, match="unknown recorder"):
        PT(Inputs(target=toy_mvn_target(2), n_chains=2, record=("trace",)))

"""Checkpoint/resume tests (reference test/test_resume.jl, test_checkpoint.jl)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from pigeons_tpu import AutoMALA, Inputs, PT, pigeons, toy_mvn_target
from pigeons_tpu.checkpoint import increment_n_rounds, latest_checkpoint_round, load_pt
from pigeons_tpu.checks import ParallelismInvarianceError, check_against_serial
from pigeons_tpu.parallel import replica_mesh


def make_inputs(tmp, **kw):
    base = dict(
        target=toy_mvn_target(3),
        n_chains=4,
        n_rounds=6,
        seed=3,
        checkpoint=True,
        checkpoint_folder=os.path.join(tmp, "run"),
        show_report=False,
    )
    base.update(kw)
    return Inputs(**base)


def test_resume_matches_uninterrupted(tmp_path):
    """A run interrupted at round 3 and resumed matches the uninterrupted run
    bit-for-bit (determinism anchor for elastic recovery)."""
    tmp = str(tmp_path)
    full = PT(make_inputs(tmp, checkpoint=False)).run()

    part = PT(make_inputs(tmp))
    for _ in range(3):
        part.run_round()
    assert latest_checkpoint_round(os.path.join(tmp, "run")) == 3

    resumed = load_pt(os.path.join(tmp, "run"))
    assert resumed.round_idx == 3
    resumed.run()
    assert np.array_equal(full.sample_array(), resumed.sample_array())
    np.testing.assert_array_equal(np.asarray(full.states), np.asarray(resumed.states))
    assert full.reports[-1].log_z_estimate == resumed.reports[-1].log_z_estimate


def test_resume_across_device_layouts(tmp_path):
    """Checkpoint written single-device resumes on a 4-device mesh with
    identical output (reference checkpoint.jl:10-13 elasticity)."""
    tmp = str(tmp_path)
    full = PT(make_inputs(tmp, checkpoint=False)).run()

    part = PT(make_inputs(tmp))
    for _ in range(2):
        part.run_round()
    mesh = replica_mesh(jax.devices()[:4])
    resumed = load_pt(os.path.join(tmp, "run"), mesh=mesh)
    resumed.run()
    assert np.array_equal(full.sample_array(), resumed.sample_array())


def test_resume_restores_explorer_state(tmp_path):
    tmp = str(tmp_path)
    pt = PT(make_inputs(tmp, explorer=AutoMALA()))
    for _ in range(4):
        pt.run_round()
    resumed = load_pt(os.path.join(tmp, "run"))
    np.testing.assert_array_equal(
        np.asarray(pt.exp_state["step_size"]), np.asarray(resumed.exp_state["step_size"])
    )


def test_increment_n_rounds(tmp_path):
    tmp = str(tmp_path)
    PT(make_inputs(tmp, n_rounds=3)).run()
    pt = increment_n_rounds(os.path.join(tmp, "run"), 2)
    pt.run()
    assert pt.round_idx == 5


def test_pigeons_resume_entry(tmp_path):
    tmp = str(tmp_path)
    PT(make_inputs(tmp, n_rounds=3)).run()
    pt = pigeons(os.path.join(tmp, "run"))  # no more rounds -> returns as-is
    assert pt.round_idx == 3


def test_checked_round_requires_checkpoint():
    # reference checks.jl:14-16: "activate checkpoint when performing checks"
    with pytest.raises(ValueError, match="checkpoint"):
        pigeons(
            target=toy_mvn_target(2), n_chains=3, n_rounds=3, checked_round=2,
            seed=1, show_report=False,
        )


@pytest.mark.slow
def test_checked_round_passes(tmp_path):
    """The product check spawns a fresh serial ChildProcess and compares the
    checkpoint FILES structurally (reference checks.jl:36-78)."""
    pt = pigeons(
        target=toy_mvn_target(2), n_chains=3, n_rounds=3, checked_round=2,
        seed=1, show_report=False, checkpoint=True,
        checkpoint_folder=str(tmp_path / "run"),
    )
    assert pt.round_idx == 3


@pytest.mark.slow
def test_checked_round_on_mesh(tmp_path):
    mesh = replica_mesh(jax.devices()[:2])
    pt = pigeons(
        target=toy_mvn_target(2), n_chains=4, n_rounds=3, checked_round=2,
        seed=1, mesh=mesh, show_report=False, checkpoint=True,
        checkpoint_folder=str(tmp_path / "run"),
    )
    assert pt.round_idx == 3


@pytest.mark.slow
def test_check_against_serial_detects_corruption(tmp_path):
    """Negative control (reference test_parallelism_invariance.jl:76-88):
    corrupt one array in the written checkpoint; the file-level comparison
    must flag it."""
    pt = pigeons(
        target=toy_mvn_target(2), n_chains=3, n_rounds=2, seed=1,
        show_report=False, checkpoint=True,
        checkpoint_folder=str(tmp_path / "run"),
    )
    from pigeons_tpu.checkpoint import round_folder

    path = os.path.join(round_folder(pt.exec_folder, 2), "checkpoint.npz")
    data = dict(np.load(path))
    data["states"] = data["states"] + 1.0
    np.savez(path, **data)
    with pytest.raises(ParallelismInvarianceError, match="states"):
        check_against_serial(pt)


@pytest.mark.slow
def test_checked_round_catches_cross_process_nondeterminism(tmp_path, monkeypatch):
    """A density depending on per-PROCESS state (a module constant derived
    from the pid) reproduces in-process but NOT across processes; only the
    ChildProcess-based check can see it (VERDICT r2 item 5)."""
    import sys

    tests_dir = os.path.dirname(__file__)
    monkeypatch.setenv(
        "PYTHONPATH",
        tests_dir + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    sys.path.insert(0, tests_dir)
    try:
        from nondeterministic_target import pid_jitter_target

        with pytest.raises(ParallelismInvarianceError):
            pigeons(
                target=pid_jitter_target(),
                n_chains=2,
                n_rounds=2,
                checked_round=2,
                seed=1,
                show_report=False,
                checkpoint=True,
                checkpoint_folder=str(tmp_path / "run"),
            )
    finally:
        sys.path.pop(0)


def test_closure_target_checkpoints_and_resumes_bitwise(tmp_path):
    """Targets holding closures (BayesianModel likelihoods over captured data
    arrays) must checkpoint: serialization goes through cloudpickle, and the
    captured data matrix dedups into the immutables store (reference
    Immutable.jl; the reference's Julia Serialization handles closures
    natively). Resume recomputes bitwise."""
    import glob

    from pigeons_tpu import AutoMALA
    from pigeons_tpu.models import logistic_regression

    t = logistic_regression(4096, 16, seed=0)  # X = 256 KB, above threshold
    pt = PT(
        Inputs(
            target=t, n_chains=3, n_rounds=4, seed=2, explorer=AutoMALA(),
            checkpoint=True, checkpoint_folder=str(tmp_path / "run"),
            show_report=False,
        )
    )
    pt.run()
    # the big captured arrays landed in immutables exactly once
    imm = glob.glob(str(tmp_path / "run" / "immutables" / "*.npy"))
    assert len(imm) >= 1
    metas = glob.glob(str(tmp_path / "run" / "round=*" / "checkpoint" / "meta.pkl"))
    assert all(os.path.getsize(p) < 100_000 for p in metas)
    again = load_pt(str(tmp_path / "run"), round_idx=3)
    again.run_round()
    np.testing.assert_array_equal(pt.sample_array(), again.sample_array())


def test_unknown_recorder_name_rejected():
    from pigeons_tpu import pigeons, toy_mvn_target

    with pytest.raises(ValueError, match="unknown recorder"):
        pigeons(target=toy_mvn_target(2), n_chains=2, n_rounds=1,
                record=("trace",), show_report=False)

"""Submission subsystem tests (reference test/test_parallelism_invariance.jl
cross-process checks + submission script generation)."""

import os

import numpy as np

from pigeons_tpu import Inputs, pigeons, toy_mvn_target
from pigeons_tpu.submission import ChildProcess, ClusterSubmission, MPISettings, watch


def test_child_process_bitwise_matches_in_process(tmp_path, monkeypatch):
    """Cross-PROCESS parallelism invariance: a fresh child process produces
    the same bits as the parent (the reference's checked_round mechanism
    spawns exactly such a child, pt/checks.jl:36-78)."""
    monkeypatch.chdir(tmp_path)
    res = pigeons(
        target=toy_mvn_target(2), n_chains=3, n_rounds=4, seed=1,
        show_report=False, on=ChildProcess(env={"JAX_PLATFORMS": "cpu"}),
    )
    child = res.load()
    local = pigeons(
        target=toy_mvn_target(2), n_chains=3, n_rounds=4, seed=1, show_report=False
    )
    assert np.array_equal(child.sample_array(), local.sample_array())
    assert child.reports[-1].log_z_estimate == local.reports[-1].log_z_estimate


def test_cluster_script_generation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for system, directive in [("slurm", "#SBATCH"), ("pbs", "#PBS"), ("lsf", "#BSUB")]:
        sub = ClusterSubmission(
            n_hosts=4,
            walltime="01:00:00",
            settings=MPISettings(submission_system=system),
            dry_run=True,
        )
        res = sub.submit(Inputs(target=toy_mvn_target(2)))
        script = open(
            os.path.join(res.exec_folder, ".submission_script.sh")
        ).read()
        assert directive in script
        assert "host_main.py" in script
        assert watch(res) == "(no output yet)"


def test_settings_roundtrip(tmp_path):
    path = str(tmp_path / "settings.json")
    MPISettings(submission_system="pbs", environment_modules=["python/3.12"]).save(path)
    loaded = MPISettings.load(path)
    assert loaded.submission_system == "pbs"
    assert loaded.environment_modules == ["python/3.12"]

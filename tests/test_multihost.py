"""Real multi-PROCESS execution: 2 ``jax.distributed`` processes × 4 virtual
CPU devices each = one 8-device global mesh, crossed by the round kernel's
collectives.

The reference tests its distributed backend under real ``mpiexec`` with 1-3
ranks and requires bitwise agreement with the serial run
(``test/test_mpi_utils.jl:9-24``, ``test/test_parallelism_invariance.jl``,
``docs/src/distributed.md:39-44``). Here: spawn two OS processes wired by
``MultiHostLauncher``, then compare process 0's results bitwise against a
single-process run of the same Inputs — layout invariance must hold across
the PROCESS boundary, not just across devices.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_bitwise(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))

    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    # isolate from any parent-process compilation cache races
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"

    got = np.load(tmp_path / "multihost_out.npz")

    # single-process reference run of the same Inputs (no mesh)
    from pigeons_tpu import Inputs, PT, SliceSampler, toy_mvn_target

    pt = PT(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=8,
            n_rounds=3,
            seed=5,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
        )
    )
    pt.run()

    np.testing.assert_array_equal(got["traces"], pt.sample_array())
    np.testing.assert_array_equal(got["chain_of"], np.asarray(pt.chain_of))
    np.testing.assert_array_equal(got["states"], np.asarray(pt.states))
    np.testing.assert_array_equal(got["accept_mean"], pt.reduced.accept_mean)
    np.testing.assert_array_equal(got["online_mean"], pt.reduced.online_mean)
    assert float(got["logz"]) == pt.reports[-1].log_z_estimate

"""Worker script for the 2-process ``jax.distributed`` test.

Each process runs the SAME program (SPMD): ``MultiHostLauncher`` wires the
processes into one runtime, the replica mesh spans all GLOBAL devices, and
the round kernel's collectives cross the process boundary. The analogue of
the reference's real-mpiexec tests (``test/test_mpi_utils.jl:9-24``,
``test/test_parallelism_invariance.jl``).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import sys

proc_id, nprocs, port, outdir = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pigeons_tpu import Inputs, SliceSampler, toy_mvn_target
from pigeons_tpu.parallel.sharding import to_host
from pigeons_tpu.submission import MultiHostLauncher

launcher = MultiHostLauncher(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)
pt = launcher.submit(
    Inputs(
        target=toy_mvn_target(3),
        n_chains=8,
        n_rounds=3,
        seed=5,
        explorer=SliceSampler(n_passes=1),
        show_report=False,
    )
)

assert len(jax.devices()) == 8 and jax.process_count() == nprocs

# to_host on the SHARDED states is a collective: every process calls it
# (SPMD contract), then only process 0 writes
states = to_host(pt.states)
chain_of = to_host(pt.chain_of)

if proc_id == 0:
    np.savez(
        f"{outdir}/multihost_out.npz",
        traces=pt.sample_array(),
        chain_of=chain_of,
        states=states,
        accept_mean=pt.reduced.accept_mean,
        online_mean=pt.reduced.online_mean,
        logz=np.float64(pt.reports[-1].log_z_estimate),
    )
print(f"process {proc_id}: done")

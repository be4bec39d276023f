"""Worker script for the multi-PROCESS ``jax.distributed`` tests.

Each process runs the SAME program (SPMD): ``MultiHostLauncher`` (or a direct
``jax.distributed.initialize``) wires the processes into one runtime, the
replica mesh spans all GLOBAL devices, and the round kernel's collectives
cross the process boundary. The analogue of the reference's real-mpiexec
tests (``test/test_mpi_utils.jl:9-24``, ``test/test_parallelism_invariance.jl``).

Usage:
  python multihost_worker.py fresh      <pid> <nprocs> <port> <outdir>
  python multihost_worker.py checkpoint <pid> <nprocs> <port> <outdir> <ckpt_folder>
  python multihost_worker.py resume     <pid> <nprocs> <port> <outdir> <ckpt_folder> <total_rounds>
  python multihost_worker.py smoke      <pid> <nprocs> <port> <outdir>

``fresh`` runs the 8-chain 3-round config and saves results;
``checkpoint`` is ``fresh`` with per-round checkpoints into <ckpt_folder>;
``resume`` loads <ckpt_folder>'s latest checkpoint under the global mesh and
runs rounds up to <total_rounds> (multi-process elastic resume, the analogue
of reference ``src/pt/checkpoint.jl:10-13``);
``smoke`` is a tiny 4-chain 2-round bitwise check for the default test tier.
"""

import sys

mode = sys.argv[1]
proc_id, nprocs, port, outdir = (
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
    sys.argv[5],
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


def save(pt, name):
    # to_host on SHARDED arrays is a collective: every process calls it
    # (SPMD contract), then only process 0 writes
    states = to_host(pt.states)
    chain_of = to_host(pt.chain_of)
    if proc_id == 0:
        np.savez(
            f"{outdir}/{name}",
            traces=pt.sample_array(),
            chain_of=chain_of,
            states=states,
            accept_mean=pt.reduced.accept_mean,
            online_mean=pt.reduced.online_mean,
            logz=np.float64(pt.reports[-1].log_z_estimate),
        )


if mode in ("fresh", "checkpoint"):
    kw = {}
    if mode == "checkpoint":
        kw = dict(checkpoint=True, checkpoint_folder=sys.argv[6])
    pt = launcher.submit(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=8,
            n_rounds=3,
            seed=5,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
            **kw,
        )
    )
    assert len(jax.devices()) == nprocs * len(jax.local_devices())
    assert jax.process_count() == nprocs
    save(pt, "multihost_out.npz")
elif mode == "resume":
    folder, total_rounds = sys.argv[6], int(sys.argv[7])
    try:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=proc_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    from pigeons_tpu.checkpoint import load_pt
    from pigeons_tpu.parallel import replica_mesh

    pt = load_pt(folder, mesh=replica_mesh(jax.devices()))
    assert jax.process_count() == nprocs
    while pt.round_idx < total_rounds:
        pt.run_round()
    save(pt, "resume_out.npz")
elif mode == "smoke":
    pt = launcher.submit(
        Inputs(
            target=toy_mvn_target(2),
            n_chains=4,
            n_rounds=2,
            seed=7,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
        )
    )
    assert jax.process_count() == nprocs
    save(pt, "smoke_out.npz")
else:
    raise SystemExit(f"unknown mode {mode!r}")

print(f"process {proc_id}: done")

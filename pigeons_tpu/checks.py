"""Run correctness checks: parallelism-invariance verification in-product.

Reference semantics (``src/pt/checks.jl``): when ``checked_round`` is set, the
run re-executes itself from scratch in a serial 1-process ChildProcess at that
round and compares every checkpoint file with ``recursive_equal`` — bitwise
agreement of a distributed run with its serial counterpart is the product's
flagship correctness guarantee ("Parallelism Invariance").

TPU-native analogue: re-run the same Inputs WITHOUT the replica mesh (plain
single-device execution) up to the checked round and compare all run state
bitwise. Layout invariance holds by construction (global-index RNG streams +
exact-zero psums), so any mismatch indicates a real bug.
"""

from __future__ import annotations

import dataclasses

import numpy as np


class ParallelismInvarianceError(AssertionError):
    pass


def preflight_checks(inputs) -> None:
    """Argument validation (reference ``checks.jl:1-30``)."""
    if inputs.n_chains < 0 or inputs.n_chains_variational < 0:
        raise ValueError("chain counts must be nonnegative")
    if inputs.n_chains + inputs.n_chains_variational < 1:
        raise ValueError("need at least one chain")
    if inputs.n_rounds < 0:
        raise ValueError("n_rounds must be nonnegative")
    if inputs.checked_round and not (0 < inputs.checked_round <= inputs.n_rounds):
        raise ValueError("checked_round must lie in [1, n_rounds]")
    if inputs.checked_round and inputs.n_replicates > 1:
        raise ValueError("checked_round with n_replicates > 1 is not supported")


def check_against_serial(pt) -> None:
    """Reference ``check_against_serial`` (``checks.jl:36-78``)."""
    from .pt import PT

    inputs = dataclasses.replace(
        pt.inputs, mesh=None, checkpoint=False, show_report=False, checked_round=0
    )
    fresh = PT(inputs)
    while fresh.round_idx < pt.round_idx:
        fresh.run_round()

    failures = []

    def cmp(name, a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape or not np.array_equal(a, b, equal_nan=True):
            failures.append(name)

    cmp("states", pt.states, fresh.states)
    cmp("chain_of", pt.chain_of, fresh.chain_of)
    cmp("replica_of", pt.replica_of, fresh.replica_of)
    cmp("schedule", pt.schedule.grids, fresh.schedule.grids)
    for field in (
        "accept_mean",
        "accept_n",
        "lsr_fwd",
        "lsr_bwd",
        "online_mean",
        "online_var",
        "energy_ac1",
        "exp_steps",
    ):
        cmp(field, getattr(pt.reduced, field), getattr(fresh.reduced, field))
    cmp("traces", pt.sample_array(), fresh.sample_array())

    if failures:
        raise ParallelismInvarianceError(
            "distributed run differs from its serial re-execution in: "
            + ", ".join(failures)
        )

"""Run configuration: the single ``Inputs`` struct.

Reference: ``src/pt/Inputs.jl:9-102`` — one kwdef struct is the entire run
config; defaults seed=1, n_rounds=10, n_chains=10.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

RECORD_DEFAULT = ("swap_acceptance_pr", "log_sum_ratio", "round_trip", "traces", "online")
RECORD_ALL = RECORD_DEFAULT + ("index_process", "energy_ac1")


@dataclass
class Inputs:
    target: Any
    seed: int = 1
    n_rounds: int = 10
    n_chains: int = 10
    # Number of independent PT ladders batched on-chip (TPU-native capability:
    # vmapped replicate systems share one compiled kernel; recorders pool
    # across replicates, multiplying effective samples per wall-clock second).
    n_replicates: int = 1
    n_chains_variational: int = 0
    reference: Optional[Any] = None
    variational: Optional[Any] = None
    checkpoint: bool = False
    checkpoint_folder: Optional[str] = None
    # Reference checks.jl: at this round, re-run serially from scratch and
    # require bitwise agreement (0 disables the check).
    checked_round: int = 0
    record: Sequence[str] = field(default_factory=lambda: RECORD_DEFAULT)
    explorer: Optional[Any] = None
    # Custom trace extractor (x, log_density) -> vector (reference
    # Inputs.extractor); default appends the log density to the state.
    extractor: Optional[Any] = None
    show_report: bool = True
    extended_traces: bool = False
    # Optional ReplicaMesh: shard the replica axis over a 1-D device mesh
    # (the analogue of launching the reference over MPI processes).
    mesh: Optional[Any] = None

    def __post_init__(self):
        self.record = tuple(self.record)

    @property
    def n_chains_total(self) -> int:
        return self.n_chains + self.n_chains_variational

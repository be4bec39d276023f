"""A deliberately NON-reproducible target for the cross-process check test.

The density shifts by a module-level constant derived from the importing
process's pid: identical within one process (so an in-process re-run would
pass), different in a freshly spawned ChildProcess (so only the
cross-process ``checked_round`` catches it). The module must be importable
by the child, hence it lives next to the tests and the target is defined at
module scope (picklable by reference).
"""

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pigeons_tpu.models.target import Reference, Target

_PID_JITTER = float(os.getpid() % 97) * 0.01


@dataclass(frozen=True)
class PidJitterTarget(Target):
    dim: int = 2

    def log_density(self, x):
        return -0.5 * jnp.sum(x * x) * (1.0 + _PID_JITTER)

    def default_reference(self) -> Reference:
        return Reference(
            log_density=lambda x: -0.5 * jnp.sum(x * x),
            sample_iid=lambda key: jax.random.normal(key, (self.dim,)),
        )

    def initialization(self, key):
        return jax.random.normal(key, (self.dim,))


def pid_jitter_target() -> PidJitterTarget:
    return PidJitterTarget()

from .aaps import AAPS
from .automala import AutoMALA
from .base import Explorer, NoOpExplorer, StepOut, ToyExplorer
from .binary_gibbs import BinaryGibbs
from .combinators import Compose, Mix, ScanMix
from .hamiltonian import (
    DiagonalPreconditioner,
    IdentityPreconditioner,
    MixDiagonalPreconditioner,
    leapfrog,
    log_joint,
)
from .mala import MALA
from .nuts import NUTS
from .pallas_slice import SliceSamplerPallas
from .slice_sampler import SliceSampler

__all__ = [
    "AAPS",
    "BinaryGibbs",
    "AutoMALA",
    "Compose",
    "DiagonalPreconditioner",
    "Explorer",
    "IdentityPreconditioner",
    "MALA",
    "Mix",
    "ScanMix",
    "MixDiagonalPreconditioner",
    "NoOpExplorer",
    "NUTS",
    "SliceSampler",
    "SliceSamplerPallas",
    "StepOut",
    "ToyExplorer",
    "leapfrog",
    "log_joint",
]

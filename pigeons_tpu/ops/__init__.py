from .base import Explorer, StepOut, ToyExplorer, NoOpExplorer
from .slice_sampler import SliceSampler

__all__ = [
    "Explorer",
    "StepOut",
    "ToyExplorer",
    "NoOpExplorer",
    "SliceSampler",
]

from .target import Target, Reference
from .toy_mvn import ToyMVNTarget, toy_mvn_target
from .test_swapper import TestSwapper

__all__ = ["Target", "Reference", "ToyMVNTarget", "toy_mvn_target", "TestSwapper"]

from .bayesian import BayesianModel
from .distributions import (
    Beta,
    Cauchy,
    Exponential,
    HalfCauchy,
    LogNormal,
    Normal,
    Uniform,
    bernoulli_logpmf,
    binomial_logpmf,
    normal_logpdf,
)
from .external import ExternalTarget, LazyTarget, register_lazy_target
from .ising import IsingTarget, ising_target
from .library import (
    Banana,
    Funnel,
    banana,
    bernoulli_target,
    eight_schools,
    funnel,
    hierarchical_normal,
    logistic_regression,
    mrna_target,
    mvn_target,
    unid_analytic_log_z,
    unid_target,
)
from .target import Reference, StandardNormalReference, Target
from .test_swapper import TestSwapper
from .toy_mvn import ToyMVNTarget, toy_mvn_target

__all__ = [
    "BayesianModel",
    "ExternalTarget",
    "LazyTarget",
    "register_lazy_target",
    "IsingTarget",
    "ising_target",
    "Banana",
    "Beta",
    "Cauchy",
    "Exponential",
    "Funnel",
    "HalfCauchy",
    "LogNormal",
    "Normal",
    "Reference",
    "StandardNormalReference",
    "Target",
    "TestSwapper",
    "ToyMVNTarget",
    "Uniform",
    "banana",
    "bernoulli_logpmf",
    "bernoulli_target",
    "binomial_logpmf",
    "eight_schools",
    "funnel",
    "hierarchical_normal",
    "logistic_regression",
    "mrna_target",
    "mvn_target",
    "normal_logpdf",
    "toy_mvn_target",
    "unid_analytic_log_z",
    "unid_target",
]

from .base import Density, merge_vars, split_vars
from .gaussian import (
    DiagonalGaussianDensity,
    DiagonalGaussianConditionalDensity,
    diagonal_gaussian_log_prob,
    diagonal_gaussian_sample,
    diagonal_gaussian_entropy,
)
from .exact import BijectionDensity
from .elbo import ELBODensity
from .split import SplitDensity
from .wrapper import WrapperDensity, DequantizationDensity, PassthroughBeforeEvalDensity
from .nonsquare import NonSquareHeadDensity, ManifoldFlowHeadDensity, NonSquareTailDensity
from .mixture import BijectionMixtureDensity
from .concrete import ConcreteConditionalDensity

__all__ = [
    "Density",
    "merge_vars",
    "split_vars",
    "DiagonalGaussianDensity",
    "DiagonalGaussianConditionalDensity",
    "diagonal_gaussian_log_prob",
    "diagonal_gaussian_sample",
    "diagonal_gaussian_entropy",
    "BijectionDensity",
    "ELBODensity",
    "SplitDensity",
    "WrapperDensity",
    "DequantizationDensity",
    "PassthroughBeforeEvalDensity",
    "NonSquareHeadDensity",
    "ManifoldFlowHeadDensity",
    "NonSquareTailDensity",
    "BijectionMixtureDensity",
    "ConcreteConditionalDensity",
]

from .base import (
    Bijection,
    InverseBijection,
    IdentityBijection,
    CompositeBijection,
)
from .affine import AffineBijection, ConditionalAffineBijection
from .coupling import (
    Checkerboard2dCouplingBijection,
    SplitChannelwiseCouplingBijection,
    AlternatingChannelwiseCouplingBijection,
    MaskedChannelwiseCouplingBijection,
)
from .batchnorm import BatchNormBijection
from .reshaping import (
    RandomChannelwisePermutationBijection,
    FlipBijection,
    ViewBijection,
    Squeeze2dBijection,
)
from .elementwise import (
    LogitBijection,
    TanhBijection,
    ScalarMultiplicationBijection,
    ScalarAdditionBijection,
)
from .linear import (
    BruteForceInvertible1x1ConvBijection,
    LUInvertible1x1ConvBijection,
    LULinearBijection,
)
from .made import MADEBijection
from .planar import PlanarBijection, ConditionalPlanarBijection
from .spline import (
    CoupledRationalQuadraticSplineBijection,
    AutoregressiveRationalQuadraticSplineBijection,
)
from .bnaf import BlockNeuralAutoregressiveBijection
from .sos import SumOfSquaresPolynomialBijection

__all__ = [
    "Bijection",
    "InverseBijection",
    "IdentityBijection",
    "CompositeBijection",
    "AffineBijection",
    "ConditionalAffineBijection",
    "Checkerboard2dCouplingBijection",
    "SplitChannelwiseCouplingBijection",
    "AlternatingChannelwiseCouplingBijection",
    "MaskedChannelwiseCouplingBijection",
    "BatchNormBijection",
    "RandomChannelwisePermutationBijection",
    "FlipBijection",
    "ViewBijection",
    "Squeeze2dBijection",
    "LogitBijection",
    "TanhBijection",
    "ScalarMultiplicationBijection",
    "ScalarAdditionBijection",
    "BruteForceInvertible1x1ConvBijection",
    "LUInvertible1x1ConvBijection",
    "LULinearBijection",
    "MADEBijection",
    "PlanarBijection",
    "ConditionalPlanarBijection",
    "CoupledRationalQuadraticSplineBijection",
    "AutoregressiveRationalQuadraticSplineBijection",
    "BlockNeuralAutoregressiveBijection",
    "SumOfSquaresPolynomialBijection",
]

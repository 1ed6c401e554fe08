from .cg import batched_cg
from .chol import jittered_cholesky, cholesky_logdet, spd_solve
from .gram import gram_from_columns
from .pallas import (
    fused_coupler_available,
    fused_gram_logdet,
    fused_gram_logdet_available,
    fused_resnet_coupler,
)

__all__ = [
    "batched_cg",
    "jittered_cholesky",
    "cholesky_logdet",
    "spd_solve",
    "gram_from_columns",
    "fused_coupler_available",
    "fused_gram_logdet",
    "fused_gram_logdet_available",
    "fused_resnet_coupler",
]

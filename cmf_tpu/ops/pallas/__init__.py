from .fused_mlp import fused_mlp, fused_mlp_available
from .gram_logdet import (
    fused_gram_logdet,
    fused_gram_logdet_available,
    fused_gram_logdet_sharded,
    fused_gram_logdet_sharded_available,
)

__all__ = [
    "fused_mlp",
    "fused_mlp_available",
    "fused_gram_logdet",
    "fused_gram_logdet_available",
    "fused_gram_logdet_sharded",
    "fused_gram_logdet_sharded_available",
]

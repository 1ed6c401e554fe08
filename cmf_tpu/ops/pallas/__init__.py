from .coupler_stack import fused_coupler_available, fused_resnet_coupler
from .gram_logdet import (
    fused_gram_logdet,
    fused_gram_logdet_available,
    fused_gram_logdet_sharded,
    fused_gram_logdet_sharded_available,
)

__all__ = [
    "fused_coupler_available",
    "fused_resnet_coupler",
    "fused_gram_logdet",
    "fused_gram_logdet_available",
    "fused_gram_logdet_sharded",
    "fused_gram_logdet_sharded_available",
]

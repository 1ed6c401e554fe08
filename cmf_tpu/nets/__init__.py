from .core import (
    compute_dtype,
    fused_inference,
    set_compute_dtype,
    MLP,
    ConstantNetwork,
    IdentityNetwork,
    GlowCNN,
    ResNet,
    AutoregressiveMLP,
    get_activation,
)

__all__ = [
    "compute_dtype",
    "fused_inference",
    "set_compute_dtype",
    "MLP",
    "ConstantNetwork",
    "IdentityNetwork",
    "GlowCNN",
    "ResNet",
    "AutoregressiveMLP",
    "get_activation",
]

from .core import (
    compute_dtype,
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
    "set_compute_dtype",
    "MLP",
    "ConstantNetwork",
    "IdentityNetwork",
    "GlowCNN",
    "ResNet",
    "AutoregressiveMLP",
    "get_activation",
]

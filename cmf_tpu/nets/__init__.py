from .core import (
    MLP,
    ConstantNetwork,
    IdentityNetwork,
    GlowCNN,
    ResNet,
    AutoregressiveMLP,
    get_activation,
)

__all__ = [
    "MLP",
    "ConstantNetwork",
    "IdentityNetwork",
    "GlowCNN",
    "ResNet",
    "AutoregressiveMLP",
    "get_activation",
]

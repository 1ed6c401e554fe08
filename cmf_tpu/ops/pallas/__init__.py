from .fused_mlp import fused_mlp, fused_mlp_available

__all__ = ["fused_mlp", "fused_mlp_available"]

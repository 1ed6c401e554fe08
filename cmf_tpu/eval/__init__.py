from .metrics import metrics
from .fid import get_fid_function, frechet_distance, activation_statistics

__all__ = ["metrics", "get_fid_function", "frechet_distance", "activation_statistics"]

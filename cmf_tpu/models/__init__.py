from .factory import get_density, get_density_recursive, get_bijection

__all__ = ["get_density", "get_density_recursive", "get_bijection"]

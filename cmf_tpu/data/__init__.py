from .loaders import ArrayLoader, get_loaders
from .two_d import get_2d_data, get_2d_datasets
from .tabular import get_tabular_datasets
from .image import get_image_datasets

__all__ = [
    "ArrayLoader",
    "get_loaders",
    "get_2d_data",
    "get_2d_datasets",
    "get_tabular_datasets",
    "get_image_datasets",
]

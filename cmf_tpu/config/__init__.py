from .dsl import CONFIG_GROUPS, GridParams, group, base, provides
from .config import (
    expand_grid,
    get_config,
    get_config_group,
    get_datasets,
    get_models,
)
from .schemas import get_schema

__all__ = [
    "CONFIG_GROUPS",
    "GridParams",
    "group",
    "base",
    "provides",
    "expand_grid",
    "get_config",
    "get_config_group",
    "get_datasets",
    "get_models",
    "get_schema",
]

from .mesh import (
    data_sharding,
    get_mesh,
    initialize_multihost,
    replicate,
    shard_batch,
)
from .grid import grid_jobs, host_shard

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicate",
    "shard_batch",
    "initialize_multihost",
    "grid_jobs",
    "host_shard",
]

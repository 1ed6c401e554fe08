from .mesh import (
    data_sharding,
    get_mesh,
    initialize_multihost,
    jacobian_column_partition,
    jacobian_column_spec,
    replicate,
    set_jacobian_column_spec,
    shard_batch,
)
from .grid import grid_jobs, host_shard

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicate",
    "shard_batch",
    "initialize_multihost",
    "jacobian_column_partition",
    "jacobian_column_spec",
    "set_jacobian_column_spec",
    "grid_jobs",
    "host_shard",
]

"""Device mesh and sharding helpers — the framework's parallelism substrate.

The reference's complete parallelism story is single-process
``nn.DataParallel`` (SURVEY.md §2.18; reference wrapper.py:52-68,
factory.py:74-82). Here:

* one global ``Mesh`` with a ``data`` axis (extensible with a ``model`` axis
  for sharding Hutchinson probes / Jacobian columns);
* batches are placed with ``NamedSharding(P("data"))``; parameters are
  replicated; XLA inserts the gradient all-reduce over ICI inside the jitted
  train step — no hand-written collectives needed for data parallelism;
* multi-host: ``initialize_multihost`` wraps ``jax.distributed.initialize``
  (DCN bootstrap); each host feeds its local shard via
  ``jax.make_array_from_process_local_data``.
"""

import contextlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Trace-time partition spec for the non-square Jacobian columns (d, B, D) —
# the d tangent pushforwards are embarrassingly parallel (SURVEY.md §5
# "long-context analog") and shard over the mesh's "model" axis. Set it (like
# nets.compute_dtype) before jitting a step variant; None ⇒ no constraint.
_JAC_COLUMN_SPEC = [None]


def set_jacobian_column_spec(spec):
    _JAC_COLUMN_SPEC[0] = spec


def jacobian_column_spec():
    return _JAC_COLUMN_SPEC[0]


@contextlib.contextmanager
def jacobian_column_partition(spec):
    old = _JAC_COLUMN_SPEC[0]
    _JAC_COLUMN_SPEC[0] = spec
    try:
        yield
    finally:
        _JAC_COLUMN_SPEC[0] = old


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Bootstrap multi-host JAX over DCN (jax.distributed). No-op when
    single-process env vars are absent and no coordinator is given."""
    if coordinator_address is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ and "COORDINATOR_ADDRESS" not in os.environ:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def get_mesh(data=None, model=1, devices=None):
    """Mesh with ("data", "model") axes. data=None ⇒ all devices / model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    devices = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def data_sharding(mesh):
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicate(mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(tree, sharding)


def shard_batch(mesh, x):
    """Place a (global) batch over the data axis. In multi-process mode, ``x``
    is this process's local shard and is assembled into the global array."""
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def psum_stats(sums, counts, axis_name="data"):
    """Cross-device reduction for metric/FID statistic accumulation inside
    shard_map'ped eval loops (replaces the reference's single-process numpy
    buffers, metrics.py:111-143)."""
    return (
        jax.lax.psum(sums, axis_name),
        jax.lax.psum(counts, axis_name),
    )

"""Worker process for the multi-process (multi-"host") distributed test.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and 4 virtual
devices per process: two workers form an 8-device global mesh over the
jax.distributed DCN bootstrap (SURVEY.md §2.18 "TPU-native equivalents").
Each worker contributes its process-local half of a deterministic global
batch via jax.make_array_from_process_local_data, runs one jitted
non-square loss+grad over the ("data","model") mesh, and prints a JSON line
with the loss and gradient norm — which must agree across processes (the
gradient all-reduce crosses the process boundary) and with the
single-process reference computed by the test.
"""

import json
import sys

import numpy as np


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    import jax
    import jax.numpy as jnp

    from cmf_tpu.parallel import get_mesh, initialize_multihost, replicate, shard_batch

    ok = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes, jax.devices()

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    config = get_config("sphere", "non-square", use_baseline=False)
    config = expand_grid(config)[0]
    config["seed"] = 0
    density = get_density(get_schema(config), x_shape=(3,))
    variables = density.init(jax.random.PRNGKey(0))

    mesh = get_mesh()
    params = replicate(mesh, variables["params"])
    state = replicate(mesh, variables["state"])

    # Deterministic global batch; this process feeds only its local rows.
    global_batch = 64
    rows = np.random.default_rng(0).normal(size=(global_batch, 3)).astype(np.float32)
    local = rows[
        process_id * global_batch // num_processes : (process_id + 1) * global_batch // num_processes
    ]
    x = shard_batch(mesh, local)

    @jax.jit
    def loss_and_gradnorm(params, state, x):
        def loss_fn(p):
            info, _ = density.elbo(
                {"params": p, "state": state}, x, rng=jax.random.PRNGKey(1),
                train=True, likelihood_wt=1.0, add_reconstruction=True,
            )
            return -jnp.mean(info["elbo"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        sq = sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
        return loss, jnp.sqrt(sq)

    with mesh:
        loss, gnorm = loss_and_gradnorm(params, state, x)
    print(json.dumps({
        "process": process_id,
        "loss": float(loss),
        "gradnorm": float(gnorm),
        "global_devices": jax.device_count(),
    }), flush=True)

    # Reach the exit-time shutdown barrier together (see _crosstopo_worker):
    # asymmetric host-side tails under CI load can exceed the coordination
    # service's shutdown deadline and fail an otherwise-successful pair.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multihost_worker_exit")


if __name__ == "__main__":
    main()

"""Distributed-semantics tests (SURVEY.md §4d): gradients computed with the
batch sharded over an 8-device CPU mesh must equal the single-device run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmf_tpu.config import expand_grid, get_config, get_schema
from cmf_tpu.models import get_density


def _build():
    cfg = expand_grid(get_config("sphere", "non-square", use_baseline=False))[0]
    cfg.update({"seed": 0, "num_density_layers": 2, "coupler_hidden_channels": [8, 8]})
    density = get_density(get_schema(cfg), x_shape=(3,))
    variables = density.init(jax.random.PRNGKey(0))
    return density, variables


def test_sharded_grads_match_single_device(rng):
    density, variables = _build()
    x = jax.random.normal(rng, (64, 3))

    def loss(params, x):
        info, _ = density.elbo({"params": params, "state": variables["state"]}, x, train=True)
        return -jnp.mean(info["elbo"])

    g_single = jax.jit(jax.grad(loss))(variables["params"], x)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    params_repl = jax.device_put(variables["params"], NamedSharding(mesh, P()))
    with mesh:
        g_sharded = jax.jit(jax.grad(loss))(params_repl, x_sharded)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_elbo_matches_single_device(rng):
    density, variables = _build()
    x = jax.random.normal(rng, (64, 3))
    info_single, _ = density.elbo(variables, x, train=False)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def elbo(v, x):
        info, _ = density.elbo(v, x, train=False)
        return info["elbo"]

    with mesh:
        e_sharded = elbo(variables, x_sharded)
    np.testing.assert_allclose(
        np.asarray(info_single["elbo"]), np.asarray(e_sharded), rtol=1e-4, atol=1e-5
    )


def test_run_eval_sharded_equals_single_device(rng):
    """Trainer._run_eval accumulates (sum, count) on device; with the batch
    sharded over the 8-device mesh GSPMD inserts the cross-device psum, and
    the averaged metrics must equal the single-device run (VERDICT r2 #7 —
    replaces the reference's single-process numpy buffers, SURVEY §2.18)."""
    import optax

    from cmf_tpu.eval import metrics
    from cmf_tpu.parallel import data_sharding, get_mesh
    from cmf_tpu.training.objectives import SquareObjective
    from cmf_tpu.training.trainer import Trainer
    from cmf_tpu.training.writer import DummyWriter

    density, variables = _build()
    batches = [jax.random.normal(jax.random.fold_in(rng, i), (16, 3)) for i in range(3)]

    def make_trainer(batch_sharding):
        return Trainer(
            density=density,
            variables=variables,
            objective=SquareObjective(),
            optimizers=[optax.adam(1e-3)],
            lr_schedules=[lambda s: 1e-3],
            train_loader=None,
            valid_loader=None,
            test_loader=None,
            writer=DummyWriter(),
            visualizer=None,
            max_epochs=1,
            early_stopping=False,
            max_bad_valid_epochs=1,
            valid_frequency=1,
            epochs_per_test=1,
            rng=jax.random.PRNGKey(7),
            batch_sharding=batch_sharding,
        )

    def fn(d, v, x, r):
        return metrics(d, v, x, num_elbo_samples=1, rng=None)

    single = make_trainer(None)._run_eval(fn, "m", batches)
    mesh = get_mesh(data=8)
    sharded = make_trainer(data_sharding(mesh))._run_eval(fn, "m", batches)
    assert set(single) == set(sharded) and len(single) >= 3
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # timing-sensitive: needs the host to itself (xdist
# workers contending for the same cores tank the measured efficiency);
# run explicitly with `pytest -m slow -k scaling`.
def test_scaling_efficiency_8_devices():
    """Data-parallel scaling on the 8-device CPU mesh must hold the
    BASELINE north-star bound (>=80% linear samples/s efficiency). This is a
    machinery check (GSPMD gradient psum, batch sharding) — ICI bandwidth
    needs real chips; the committed SCALING_cpu8.json artifact documents the
    single-chip container limitation."""
    import sys

    sys.path.insert(0, ".")
    from benchmarks.scaling import measure

    sps1 = measure(1, per_device_batch=128, n_steps=5, depth=2)
    sps8 = measure(8, per_device_batch=128, n_steps=5, depth=2)
    eff = sps8 / (8 * sps1)
    assert eff >= 0.8, f"scaling efficiency {eff:.3f} < 0.8 at 8 devices"


def test_grid_scheduler():
    from cmf_tpu.parallel import grid_jobs, host_shard

    grid = [{"a": 1}, {"a": 2}]
    jobs = grid_jobs(grid, num_seeds=3, fixed_seed=100)
    assert len(jobs) == 6
    assert jobs[0]["seed"] == 100 and jobs[1]["seed"] == 101
    shards = [host_shard(jobs, i, 4) for i in range(4)]
    assert sum(len(s) for s in shards) == 6
    # deterministic and disjoint
    seen = [id(j) for s in shards for j in s]
    assert len(seen) == len(set(seen))


def test_mesh_helpers():
    from cmf_tpu.parallel import data_sharding, get_mesh, replicate, shard_batch

    mesh = get_mesh(data=8)
    assert mesh.shape == {"data": 8, "model": 1}
    x = jnp.ones((16, 4))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == data_sharding(mesh).spec
    p = replicate(mesh, {"w": jnp.ones(3)})
    assert p["w"].sharding.is_fully_replicated

"""Multi-process ("multi-host") distributed validation.

ROADMAP: exercise parallel/initialize_multihost beyond single-process — a
real jax.distributed DCN bootstrap with two processes of 4 virtual CPU
devices each, forming one 8-device global mesh. The per-process losses and
gradient norms must be identical (the gradient all-reduce crosses the
process boundary) and must match a single-process 8-device run of the same
computation (SURVEY.md §4(d) distributed-equality strategy).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def test_two_process_mesh_matches_single_process():
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=_worker_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        results[rec["process"]] = rec

    assert results[0]["global_devices"] == 8
    # Cross-process agreement: the all-reduced loss/grad must be bitwise-close.
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["gradnorm"], results[1]["gradnorm"], rtol=1e-6)

    # Single-process reference on the full batch (same params, same rng).
    import jax
    import jax.numpy as jnp

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    config = get_config("sphere", "non-square", use_baseline=False)
    config = expand_grid(config)[0]
    config["seed"] = 0
    density = get_density(get_schema(config), x_shape=(3,))
    variables = density.init(jax.random.PRNGKey(0))
    rows = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32))

    def loss_fn(p):
        info, _ = density.elbo(
            {"params": p, "state": variables["state"]}, rows, rng=jax.random.PRNGKey(1),
            train=True, likelihood_wt=1.0, add_reconstruction=True,
        )
        return -jnp.mean(info["elbo"])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))))
    np.testing.assert_allclose(results[0]["loss"], float(loss), rtol=1e-5)
    np.testing.assert_allclose(results[0]["gradnorm"], gnorm, rtol=1e-4)

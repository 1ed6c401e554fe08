"""Multi-process ("multi-host") distributed validation.

ROADMAP: exercise parallel/initialize_multihost beyond single-process — a
real jax.distributed DCN bootstrap with two processes of 4 virtual CPU
devices each, forming one 8-device global mesh. The per-process losses and
gradient norms must be identical (the gradient all-reduce crosses the
process boundary) and must match a single-process 8-device run of the same
computation (SURVEY.md §4(d) distributed-equality strategy).
"""

import contextlib
import fcntl
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _free_port(start=21817, end=21999):
    """Probe-bind a coordinator port OUTSIDE the kernel's ephemeral range
    (/proc/sys/net/ipv4/ip_local_port_range, default 32768-60999).

    Why not bind(0): the probe socket must be CLOSED before the worker
    process binds the port, and the worker takes seconds to import jax —
    a TOCTOU window in which another bind(0) (the other multihost test
    under xdist, or any outbound connect's ephemeral allocation) can be
    handed the same port. The flake study (tests/_multihost_flake_study.py)
    shows a same-port pair produces exactly the observed flake signatures:
    CoordinationService errors and 300s+ rendezvous hangs. A fixed probed
    range below the ephemeral window cannot be stolen by ephemeral
    allocation, and _rendezvous_lock serializes our own tests."""
    for port in range(start, end):
        s = socket.socket()
        try:
            s.bind(("localhost", port))
        except OSError:
            continue
        finally:
            s.close()
        return port
    raise RuntimeError(f"no free port in {start}-{end}")


@contextlib.contextmanager
def _rendezvous_lock():
    """Inter-process mutex over the whole worker-pair run: under xdist the
    two multihost tests land in different pytest processes and their Gloo/
    coordination-service rendezvous (port bind + connect) must not overlap —
    concurrent pairs were the diagnosed source of the round-4 'infra flake'
    (port collision via the _free_port TOCTOU)."""
    path = os.path.join(tempfile.gettempdir(), "cmf_tpu_multihost.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def _run_worker_pair(worker, extra_args=()):
    """Launch the 2-process worker pair; return {process_index: result_dict}.

    No retry: the round-4 'Gloo rendezvous flake' was diagnosed as a port
    collision (see _free_port / _rendezvous_lock docstrings and
    tests/_multihost_flake_study.py), which the probed port range + the
    inter-process lock remove deterministically. A failure here is a real
    failure and must surface."""
    with _rendezvous_lock():
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), "2", str(port), *extra_args],
                env=_worker_env(),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        try:
            outs = [p.communicate(timeout=600) for p in procs]
        except subprocess.TimeoutExpired:
            # Kill both workers so nothing leaks into the rest of the suite
            # (round-4 advisor finding), then surface the hang.
            for p in procs:
                if p.poll() is None:
                    p.kill()
            outs = [p.communicate() for p in procs]
            raise AssertionError(
                f"worker pair hung >600s on port {port}; stderr tails:\n"
                + "\n---\n".join(err[-1500:] for _, err in outs)
            )
    fails = [err for p, (_, err) in zip(procs, outs) if p.returncode != 0]
    if fails:
        raise AssertionError(f"worker failed:\n{fails[0][-3000:]}")
    results = {}
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        results[rec["process"]] = rec
    return results


def test_two_process_mesh_matches_single_process():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")
    results = _run_worker_pair(worker)

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


def _probe_loss(density, trainer):
    """Deterministic eval-mode objective on the first test batch."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(trainer.test_loader.x)[:100])
    info, _ = density.elbo(
        trainer._eval_variables(), x, rng=jax.random.PRNGKey(0), train=False,
        likelihood_wt=1.0, add_reconstruction=True,
    )
    return float(-jnp.mean(info["elbo"]))


def test_checkpoint_restores_across_process_topologies(tmp_path):
    """Round-3 verdict item 8: a checkpoint SAVED under the two-process
    8-device mesh (public experiment API, batch sharded over "data",
    process-0-only writer) must restore SINGLE-process with

    1. bitwise-equal parameters (checkpoint.py to_host claims
       device-independence — proven across process topologies), and
    2. a continuation loss trajectory matching an uninterrupted
       single-process run of the same seed (optimizer moments, PRNG key and
       epoch counters all survive the topology change; a dropped Adam state
       or reset RNG shows up far outside the float-accumulation tolerance).
    """
    worker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_crosstopo_worker.py"
    )
    run_root = str(tmp_path / "runs")
    results = _run_worker_pair(worker, extra_args=(run_root,))
    run_dir = results[0]["run_dir"]
    assert run_dir and os.path.exists(os.path.join(run_dir, "config.json"))
    np.testing.assert_allclose(
        results[0]["fingerprint"], results[1]["fingerprint"], rtol=1e-12
    )

    import jax

    from cmf_tpu.training.experiment import setup_experiment

    with open(os.path.join(run_dir, "config.json")) as f:
        config = json.load(f)

    # 1. Single-process restore: parameters must match the two-process
    # fingerprint bitwise (float64 sum of float32 |params| is exact here).
    config_cont = {**config, "max_epochs": 4}
    setup = setup_experiment(config_cont, resume_dir=run_dir, write_to_disk=False)
    trainer = setup["trainer"]
    assert trainer.epoch == 2
    restored_fp = float(
        sum(
            np.float64(np.sum(np.abs(np.asarray(p))))
            for p in jax.tree.leaves(jax.device_get(trainer.params))
        )
    )
    assert restored_fp == results[0]["fingerprint"], (
        f"restored fingerprint {restored_fp!r} != saved {results[0]['fingerprint']!r}"
    )

    # 2. Continue 2 epochs single-process, probing after each epoch.
    resumed_traj = []
    for _ in range(2):
        trainer.epoch += 1
        trainer._train_epoch(trainer.epoch)
        resumed_traj.append(_probe_loss(setup["density"], trainer))

    # Uninterrupted single-process reference with the identical config.
    config_ref = {
        **config,
        "max_epochs": 2,
        "logdir_root": str(tmp_path / "runs_ref"),
    }
    setup_ref = setup_experiment(config_ref, write_to_disk=False)
    trainer_ref = setup_ref["trainer"]
    trainer_ref.train()
    ref_traj = []
    for _ in range(2):
        trainer_ref.epoch += 1
        trainer_ref._train_epoch(trainer_ref.epoch)
        ref_traj.append(_probe_loss(setup_ref["density"], trainer_ref))

    # Epochs 1-2 ran sharded-8-device vs single-device, so the trajectories
    # differ only by float reduction order accumulated through 2 more Adam
    # epochs — percent-level at most; a real resume bug is orders larger.
    np.testing.assert_allclose(resumed_traj, ref_traj, rtol=2e-2, atol=2e-2)

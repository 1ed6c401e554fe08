"""Worker for the cross-topology checkpoint restore test.

Two processes of 4 virtual CPU devices each bootstrap one 8-device global
("data", "model") mesh via jax.distributed, run the PUBLIC experiment API
(setup_experiment → trainer.train()) for two epochs with the batch sharded
over the data axis, and checkpoint through the normal writer path (process 0
writes; process 1 runs a DummyWriter — the multihost write discipline).
Prints the run dir and a parameter fingerprint; tests/test_multihost.py then
restores that checkpoint SINGLE-process and proves bitwise state equality +
loss-trajectory continuation (ref trainer.py:362-400 resume semantics).
"""

import json
import sys

import numpy as np


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    run_root = sys.argv[4]

    import jax

    from cmf_tpu.parallel import data_sharding, get_mesh, initialize_multihost

    ok = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok and jax.device_count() == 4 * num_processes

    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training.experiment import _write_run_metadata, setup_experiment

    config = get_config("sphere", "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": "sphere", **config}
    config = expand_grid(config)[0]
    config.update(
        {
            "seed": 0,
            "max_epochs": 2,
            "early_stopping": False,
            "epochs_per_test": 100,
            "logdir_root": run_root,
            "rundir_tail": "_crosstopo",
        }
    )

    mesh = get_mesh()
    sharding = data_sharding(mesh)
    setup = setup_experiment(
        config, write_to_disk=(process_id == 0), sharding=sharding
    )
    trainer = setup["trainer"]
    if process_id == 0:
        _write_run_metadata(setup["writer"], config, trainer)
    with mesh:
        trainer.train()

    params_host = jax.tree.map(np.asarray, jax.device_get(trainer.params))
    fingerprint = float(
        sum(np.float64(np.sum(np.abs(p))) for p in jax.tree.leaves(params_host))
    )
    print(
        json.dumps(
            {
                "process": process_id,
                "run_dir": setup["writer"].logdir if process_id == 0 else None,
                "epoch": trainer.epoch,
                "fingerprint": fingerprint,
            }
        ),
        flush=True,
    )

    # Arrive at the exit-time coordination-service shutdown barrier TOGETHER.
    # Process 0 does host-side work process 1 doesn't (orbax checkpoint +
    # metadata writes, the fingerprint device_get); on a loaded CI host that
    # skew can exceed the service's shutdown deadline, failing the pair with
    # "Shutdown barrier timed out: 1/2" even though both workers succeeded.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("crosstopo_worker_exit")


if __name__ == "__main__":
    main()

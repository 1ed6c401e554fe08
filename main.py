#!/usr/bin/env python3
"""CLI driver for cmf_tpu.

Contract: reference main.py:17-158 — same flags, same config-override
mini-language (`--config key=value` with ast.literal_eval typing,
main.py:32-45), grid × num-seeds run loop with time-derived seeds
(main.py:141-144), introspection modes.

TPU additions: --mesh data=N to lay the batch over a named device mesh, and
--grid-shard i/n to run a slice of the (config, seed) grid on this host
(multi-host grid fan-out, SURVEY.md §2.18).
"""

import argparse
import ast
import contextlib
import json
import pprint
import sys
import time
from pathlib import Path

sys.setrecursionlimit(3000)

from cmf_tpu.config import expand_grid, get_config, get_datasets, get_models, get_schema


def parse_config_arg(key_value):
    assert "=" in key_value, "Must specify config items with format `key=value`"
    k, v = key_value.split("=", maxsplit=1)
    assert k, "Config item can't have empty key"
    assert v, "Config item can't have empty value"
    try:
        v = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        v = str(v)
    return k, v


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", help="Directory of run to resume. Ignores other command-line settings for run.")
    parser.add_argument("--model", choices=get_models())
    parser.add_argument("--dataset", choices=get_datasets())
    parser.add_argument("--baseline", action="store_true", help="Run baseline flow instead of CIF")
    parser.add_argument("--num-seeds", type=int, default=1, help="Number of random seeds to use.")
    parser.add_argument("--checkpoints", choices=["best-valid", "latest", "both", "none"], default="both")
    parser.add_argument("--nosave", action="store_true", help="Don't save anything to disk")
    parser.add_argument("--data-root", default="data/", help="Location of training data")
    parser.add_argument("--logdir-root", default="runs/", help="Location of log files")
    parser.add_argument("--config", default=[], action="append", help="Override config entries as `key=value`.")
    parser.add_argument("--rundir-tail", default="", help="Suffix for the run directory name.")
    parser.add_argument("--print-config", action="store_true")
    parser.add_argument("--print-schema", action="store_true")
    parser.add_argument("--print-model", action="store_true")
    parser.add_argument("--print-num-params", action="store_true")
    parser.add_argument("--test", action="store_true", help="Test model and exit instead of training.")
    parser.add_argument("--overwrite-metrics", action="store_true")
    parser.add_argument("--test-fid", action="store_true", help="Use test dataset for FID.")
    parser.add_argument("--test-ood", action="store_true", help="Test out-of-distribution metrics.")
    parser.add_argument("--test-metric", action="store_true", help="Test metric tensor.")
    parser.add_argument("--test-center", action="store_true",
                        help="Centering analysis plots (reference experiment.py:213 centering_test_plots).")
    parser.add_argument("--two-dim-manifold", action="store_true",
                        help="Visualize the two-dim manifold for image data when d=2.")
    parser.add_argument("--synthetic-data", action="store_true",
                        help="Use shape-matched synthetic stand-ins for tabular/image data.")
    # TPU-native extensions
    parser.add_argument("--mesh", default=None,
                        help="Device mesh spec, e.g. `data=8`. Default: all local devices on one data axis.")
    parser.add_argument("--profile-dir", default=None,
                        help="Write a jax.profiler trace of the first post-compile epoch here.")
    parser.add_argument("--grid-shard", default=None,
                        help="`i/n`: run the i-th of n slices of the expanded (config×seed) grid on this host.")
    return parser



def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat runs and resumes skip the
    (minutes-long, over remote-compile tunnels) recompiles."""
    import os
    import jax

    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cmf_tpu_xla"))
    # Per-backend subdir: AOT results compiled under one host profile emit
    # machine-feature warnings when loaded by another process kind.
    path = os.path.join(base, jax.default_backend())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def get_sharding(mesh_spec):
    """Build a NamedSharding over the data axis for input batches."""
    import numpy as np
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = jax.devices()
    if mesh_spec:
        axis, n = mesh_spec.split("=")
        n = int(n)
        assert axis == "data", f"Only a data axis is meaningful here, got {axis}"
        devices = devices[:n]
    if len(devices) <= 1:
        return None
    mesh = Mesh(np.array(devices), ("data",))
    return NamedSharding(mesh, PartitionSpec("data"))


def main(argv=None):
    _enable_compilation_cache()
    args = build_parser().parse_args(argv)

    if args.resume is None:
        assert args.model is not None and args.dataset is not None
        config = get_config(model=args.model, dataset=args.dataset, use_baseline=args.baseline)
        assert "model" not in config, "Should not specify model in config"
        assert "dataset" not in config, "Should not specify dataset in config"
        config = {"model": args.model, "dataset": args.dataset, **config}
        config = {**config, **dict(parse_config_arg(kv) for kv in args.config)}
        config = {
            **config,
            "should_checkpoint_best_valid": args.checkpoints in ["best-valid", "both"],
            "should_checkpoint_latest": args.checkpoints in ["latest", "both"],
            "write_to_disk": not args.nosave,
            "nosave": args.nosave,
            "data_root": args.data_root,
            "logdir_root": args.logdir_root,
            "rundir_tail": args.rundir_tail,
            "synthetic_data": args.synthetic_data or None,
            "profile_dir": args.profile_dir,
        }
    else:
        with open(Path(args.resume) / "config.json", "r") as f:
            config = json.load(f)
        args.num_seeds = 1

    should_train = True

    if args.print_config:
        pprint.sorted = lambda x, key=None: x
        pprint.PrettyPrinter(indent=4).pprint(config)
        should_train = False

    grid = expand_grid(config)

    if args.print_model:
        from cmf_tpu.training import print_model

        for c in grid:
            print_model({**c, "seed": c.get("seed", 0)})
        should_train = False

    if args.print_num_params:
        from cmf_tpu.training import print_num_params

        for c in grid:
            print_num_params({**c, "seed": c.get("seed", 0)})
        should_train = False

    if args.print_schema:
        if len(grid) == 1:
            print(json.dumps(get_schema(grid[0]), indent=4))
        else:
            for i, c in enumerate(grid):
                if i > 0:
                    print()
                print("=" * 10 + f" Schema {i} " + "=" * 10 + "\n")
                print(json.dumps(get_schema(c), indent=4))
        should_train = False

    if not (should_train or args.test):
        return

    from cmf_tpu.training import (
        centering_test_plots,
        generate_ood_metrics,
        metric_test_plots,
        ood_classification,
        test_and_visualize,
        train,
        visualize_two_dim_manifold,
    )

    sharding = get_sharding(args.mesh)

    # Expand (config, seed) jobs, then optionally take this host's shard
    jobs = []
    for c in grid:
        for _ in range(args.num_seeds):
            if "seed" not in c or args.num_seeds > 1:
                c = {**c, "seed": int(time.time() * 1e6) % 2**32}
            jobs.append(dict(c))
    if args.grid_shard:
        i, n = (int(v) for v in args.grid_shard.split("/"))
        jobs = jobs[i::n]
        print(f"Grid shard {i}/{n}: running {len(jobs)} of the expanded jobs")

    with contextlib.suppress(KeyboardInterrupt):
        for c in jobs:
            if args.test or args.test_fid:
                test_and_visualize(
                    config=c, resume_dir=args.resume,
                    overwrite=args.overwrite_metrics, test_fid=args.test_fid,
                    sharding=sharding,
                )
            elif args.two_dim_manifold:
                visualize_two_dim_manifold(config=c, resume_dir=args.resume, sharding=sharding)
            elif args.test_ood:
                generate_ood_metrics(config=c, resume_dir=args.resume, sharding=sharding)
                ood_classification(resume_dir=args.resume)
            elif args.test_metric:
                metric_test_plots(config=c, resume_dir=args.resume, sharding=sharding)
            elif args.test_center:
                centering_test_plots(config=c, resume_dir=args.resume, sharding=sharding)
            else:
                train(config=c, resume_dir=args.resume, sharding=sharding)


if __name__ == "__main__":
    main()

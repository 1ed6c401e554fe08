#!/usr/bin/env python3
"""Square-flow + CIF convergence battery (round-4 verdict missing #3).

The reference is three model families (SURVEY.md intro); families 1 (square
flows) and 2 (CIFs) had build-and-step tests but no committed convergence
evidence — every committed quality number was non-square. This battery runs
the reference 2-D protocol (config/two_d.py:63-90: batch 1000, adam 1e-3,
2000 epochs, early stopping on valid log-prob) for

  * square flows {realnvp, maf, nsf-ar} as BASELINES (use_baseline=True —
    pure flow, no u channels) on {2spirals, checkerboard, von-mises-circle},
    5 seeds each, reporting importance-sampled test log-prob
    (num_test_elbo_samples=100, metrics.py:17-37 semantics);
  * the CIF pair: realnvp with use_baseline=False (num_u_channels=1,
    cond-affine u machinery — ELBODensity, ref factory.py:165-190) on the
    same datasets/seeds, so the u-channel delta on test log-prob is read
    directly against the baseline row.

von-mises-circle caveat (deliberate, per the round-4 verdict's dataset
list): its support is the NOISELESS unit circle — a measure-zero set — so a
square flow's likelihood is unbounded above and the fitted log-prob measures
how far training pushed toward the degenerate solution, not a converged
density. It is included as the degenerate-support anchor; 2spirals /
checkerboard are the proper 2-D density benchmarks.

Usage:
    python analysis/square_flow_battery.py --runs-dir runs_sqflow \
        [--seeds 5] [--out SQUARE_FLOW_r5.md]
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, record_provenance  # noqa: E402

DATASETS = ["2spirals", "checkerboard", "von-mises-circle"]
# (label, model, use_baseline)
ARMS = [
    ("realnvp", "realnvp", True),
    ("maf", "maf", True),
    ("nsf-ar", "nsf-ar", True),
    ("realnvp-cif", "realnvp", False),
]


def run_arm(label, model, use_baseline, dataset, seed, args):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import test_and_visualize, train

    config = get_config(dataset, model, use_baseline=use_baseline)
    config = {"model": model, "dataset": dataset, **config}
    config = expand_grid(config)[0]
    config["seed"] = seed
    config["logdir_root"] = args.runs_dir
    config["rundir_tail"] = f"_{label}_seed{seed}"
    if args.epochs:
        config["max_epochs"] = args.epochs

    setup = train(config)
    run_dir = setup["writer"].logdir
    results = test_and_visualize(config, run_dir, overwrite=True)
    results["arm"] = label
    record_provenance(results)
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=4)
    return run_dir, results


def _mean_stderr(vals):
    vals = np.asarray([v for v in vals if v is not None and np.isfinite(v)],
                      dtype=np.float64)
    if len(vals) == 0:
        return float("nan"), float("nan"), 0
    se = float(np.std(vals, ddof=1) / math.sqrt(len(vals))) if len(vals) > 1 else 0.0
    return float(np.mean(vals)), se, len(vals)


def collect(runs_dir):
    rows = {}
    for dataset in DATASETS:
        ddir = os.path.join(runs_dir, dataset)
        if not os.path.isdir(ddir):
            continue
        for run in sorted(os.listdir(ddir)):
            mpath = os.path.join(ddir, run, "metrics.json")
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                results = json.load(f)
            if results.get("arm"):
                rows.setdefault((dataset, results["arm"]), []).append(results)
    return rows


def render(rows, seeds):
    lines = [
        f"## Square-flow / CIF 2-D convergence battery ({seeds} seeds, "
        "reference 2-D protocol)",
        "",
        "| dataset | arm | test log-prob | elbo-gap | n |",
        "|---|---|---|---|---|",
    ]
    for dataset in DATASETS:
        for label, _, _ in ARMS:
            recs = rows.get((dataset, label), [])
            lp_m, lp_se, n = _mean_stderr([r.get("log-prob") for r in recs])
            gap_m, gap_se, _ = _mean_stderr([r.get("elbo-gap") for r in recs])
            lines.append(
                f"| {dataset} | {label} | {lp_m:.3f} ± {lp_se:.3f} | "
                f"{gap_m:.3f} ± {gap_se:.3f} | {n} |"
            )
    # CIF delta per dataset
    lines += ["", "CIF (u-channel) effect — realnvp-cif minus realnvp test log-prob:", ""]
    for dataset in DATASETS:
        base = [r.get("log-prob") for r in rows.get((dataset, "realnvp"), [])]
        cif = [r.get("log-prob") for r in rows.get((dataset, "realnvp-cif"), [])]
        b_m, _, nb = _mean_stderr(base)
        c_m, _, nc = _mean_stderr(cif)
        if nb and nc:
            lines.append(f"* {dataset}: {c_m - b_m:+.3f} nats "
                         f"(cif {c_m:.3f} vs baseline {b_m:.3f})")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs-dir", default="runs_sqflow")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--datasets", nargs="*", default=None,
                    help="restrict this invocation's runs to these datasets "
                         "(lets a TPU and a CPU lane split the battery; "
                         "aggregation always reads the full runs dir)")
    ap.add_argument("--arms", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--aggregate", action="store_true")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    if not args.aggregate:
        for dataset in DATASETS:
            if args.datasets and dataset not in args.datasets:
                continue
            for label, model, use_baseline in ARMS:
                if args.arms and label not in args.arms:
                    continue
                for seed in range(args.seeds):
                    # resumable: skip runs that already produced metrics
                    existing = [
                        run for run in (
                            sorted(os.listdir(os.path.join(args.runs_dir, dataset)))
                            if os.path.isdir(os.path.join(args.runs_dir, dataset))
                            else []
                        )
                        if run.endswith(f"_{label}_seed{seed}")
                        and os.path.exists(os.path.join(
                            args.runs_dir, dataset, run, "metrics.json"))
                    ]
                    if existing:
                        continue
                    run_dir, results = run_arm(
                        label, model, use_baseline, dataset, seed, args
                    )
                    print(json.dumps({
                        "dataset": dataset, "arm": label, "seed": seed,
                        "run": run_dir,
                        "log_prob": results.get("log-prob"),
                        "loss": results.get("loss"),
                    }), flush=True)

    rows = collect(args.runs_dir)
    md = render(rows, args.seeds)
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")
    return rows


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""One-command reproduction of the reference's published tables.

The container has no UCI tabular data, no torchvision image caches and no
pinned Inception weights (zero egress), so the paper's quality tables
(`/root/reference/analysis/tabular_table.csv:2-5`, README.md:224-233 MACS)
have never been reproducible here. This harness IS the missing one command:
point it at real data and it runs the full reference protocol
(analysis/tabular_evaluate.py:25-115); run it with --synthetic and the same
plumbing executes end-to-end on the in-container fallbacks (the slow-marked
CI test does exactly that).

Protocol (reference analysis/tabular_evaluate.py + config/tabular.py):
  * tabular: power/gas/hepmass/miniboone non-square at the group defaults
    (latent dims 2/2/10/21, batch 5000/2500/750/400), one arm per
    λ = metric_regularization_param ∈ {0 (RNF), 0.01, 0.1, 1} with
    g_ij_loss = (λ > 0); 5 seeds; metric = raw-tabular-feature Fréchet
    distance on the TEST set (test_and_visualize(..., test_fid=True));
    aggregation mean ± stderr, NaN-excluded. The reference additionally
    DROPS any run with FID > 1.5 (tabular_evaluate.py:84-88 — including
    miniboone, where the published RNF mean of 136 shows the filter was not
    applied for the paper's table); we report both filtered and unfiltered.
  * images: mnist/fashion-mnist non-square at latent_dimension=10 (the
    README MACS table's d), arms {RNF: g_ij_loss=False, CMF: g_ij_loss=True},
    both on the exact-Gram path (this framework asserts on g_ij+hutch
    instead of reproducing the reference's accidental probe broadcast,
    ref non_square.py:95-99); metrics = FID (real InceptionV3 when
    --inception-weights / CMF_TPU_INCEPTION_WEIGHTS is set, honestly-stamped
    proxy otherwise) and MACS (viz/metric_analysis.canonical_metric_summary).

Usage:
    python analysis/reproduce_tables.py --data-root /data [--seeds 5]
        [--inception-weights pt_inception.npz] [--runs-dir runs_repro]
        [--out REPRODUCTION.md]
    python analysis/reproduce_tables.py --synthetic --epochs 5 ...   # CI
    python analysis/reproduce_tables.py --aggregate                  # re-table
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, record_provenance  # noqa: E402

TAB_DATASETS = ["power", "gas", "hepmass", "miniboone"]
IMG_DATASETS = ["mnist", "fashion-mnist"]
LAMBDAS = [0.0, 0.01, 0.1, 1.0]

# analysis/tabular_table.csv:2-5 — (mean, stderr) per (dataset, λ)
BASELINE_TABULAR = {
    ("power", 0.0): (0.074, 0.012), ("power", 0.01): (0.066, 0.015),
    ("power", 0.1): (0.059, 0.008), ("power", 1.0): (0.274, 0.142),
    ("gas", 0.0): (0.335, 0.030), ("gas", 0.01): (0.305, 0.059),
    ("gas", 0.1): (0.422, 0.094), ("gas", 1.0): (0.575, 0.136),
    ("hepmass", 0.0): (0.737, 0.068), ("hepmass", 0.01): (0.807, 0.133),
    ("hepmass", 0.1): (0.562, 0.038), ("hepmass", 1.0): (0.718, 0.104),
    ("miniboone", 0.0): (136.247, 133.441), ("miniboone", 0.01): (2.486, 0.440),
    ("miniboone", 0.1): (2.912, 0.802), ("miniboone", 1.0): (342.771, 333.824),
}
# README.md:224-233 (F-MNIST / Omniglot d=10)
BASELINE_MACS = {"fashion-mnist": {"RNF": 0.03, "CMF": 0.02}}


def method_name(lam):
    return "RNF" if lam == 0 else f"CML-l-{lam:g}"


_CI_SMALL_TABULAR = {
    "coupler_hidden_channels": [16] * 2,
    "num_density_layers": 2,
    "prior_num_density_layers": 2,
    "prior_hidden_channels": [16] * 2,
    "train_batch_size": 100,
    "valid_batch_size": 100,
    "test_batch_size": 100,
    "num_fid_samples": 500,
}
_CI_SMALL_IMAGE = {
    "g_hidden_channels": [8] * 2,
    "num_density_layers": 4,
    "prior_num_density_layers": 2,
    "prior_hidden_channels": [8] * 2,
    "latent_dimension": 4,
    "train_batch_size": 20,
    "valid_batch_size": 20,
    "test_batch_size": 20,
    "num_fid_samples": 100,
    "fid_dims": 64,
}


def _common(config, args, dataset, tail):
    if getattr(args, "ci_small", False):
        config.update(
            _CI_SMALL_IMAGE if dataset in IMG_DATASETS else _CI_SMALL_TABULAR
        )
    if args.data_root:
        config["data_root"] = args.data_root
    if args.synthetic:
        config["synthetic_data"] = True
    if args.max_dataset_size:
        config["max_dataset_size"] = args.max_dataset_size
    if args.epochs:
        scale = args.epochs / config["max_epochs"]
        for k in ("likelihood_warmup_start", "likelihood_warmup_end"):
            if config.get(k):
                config[k] = max(1, int(round(config[k] * scale)))
        config["max_epochs"] = args.epochs
    config["logdir_root"] = args.runs_dir  # writer adds <dataset>/<stamp><tail>
    config["rundir_tail"] = tail
    return config


def _latest_run_dir(runs_dir, dataset, tail):
    ddir = os.path.join(runs_dir, dataset)
    runs = sorted(r for r in os.listdir(ddir) if r.endswith(tail))
    assert runs, f"no run dir matching *{tail} under {ddir}"
    return os.path.join(ddir, runs[-1])


def _train_tolerating_nan(config, args, dataset, tail):
    """Train; on a NaN/Inf loss, keep the run and evaluate its last saved
    checkpoint — the reference's semantics (ignite TerminateOnNan stops the
    ENGINE, ref trainer.py:139, and the run is still testable from
    best_valid/latest; its λ=1 rows' huge variance is exactly such runs).
    Returns (run_dir, nan_during_training)."""
    from cmf_tpu.training import train

    try:
        setup = train(config)
        return setup["writer"].logdir, False
    except FloatingPointError:
        return _latest_run_dir(args.runs_dir, dataset, tail), True


def run_tabular(dataset, lam, seed, args):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import test_and_visualize

    config = get_config(dataset, "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": dataset, **config}
    config["metric_regularization_param"] = lam
    config["g_ij_loss"] = lam > 0
    config = expand_grid(config)[0]
    config["seed"] = seed
    tail = f"_l{lam:g}_seed{seed}"
    _common(config, args, dataset, tail)

    run_dir, nan = _train_tolerating_nan(config, args, dataset, tail)
    results = test_and_visualize(config, run_dir, overwrite=True, test_fid=True)
    if nan:
        results["nan_during_training"] = True
    results.update({"lambda": lam, "method": method_name(lam)})
    record_provenance(results)
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=4)
    return run_dir, results


# Synthetic-image sizing (ab_battery's measured-affordable mnist protocol):
# on the in-container synthetic fallbacks the full images-group config
# (multiscale nets, 10k-image splits, 1000 epochs) costs ~40 min/run on the
# v5e for zero extra evidence value — the synthetic table is a plumbing +
# direction demonstration, not a real-data quality claim. Real-data runs
# (--data-root, no --synthetic) keep the full reference protocol.
_SYNTH_IMAGE_SIZING = {
    "max_dataset_size": 1500,
    "g_hidden_channels": [64] * 4,
    "prior_hidden_channels": [32] * 4,
    "use_fid": False,
    # Image non-square valid loss is hardcoded 0 (reference experiment.py:
    # 592-593, FID substitutes) — early stopping would freeze best_valid at
    # the first validation epoch; train the fixed schedule, measure latest.
    "early_stopping": False,
    "max_epochs": 45,
    "likelihood_warmup_start": 15,
    "likelihood_warmup_end": 30,
    "epochs_per_test": 60,
}


def run_image(dataset, arm, seed, args):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import load_run, test_and_visualize, train
    from cmf_tpu.viz.metric_analysis import canonical_metric_summary

    config = get_config(dataset, "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": dataset, **config}
    config.update(
        {
            "latent_dimension": 10,
            "log_jacobian_method": "cholesky",
            "g_ij_loss": arm == "CMF",
        }
    )
    if args.synthetic and not getattr(args, "ci_small", False):
        config.update(_SYNTH_IMAGE_SIZING)
    config = expand_grid(config)[0]
    config["seed"] = seed
    tail = f"_{arm}_seed{seed}"
    _common(config, args, dataset, tail)

    run_dir, nan = _train_tolerating_nan(config, args, dataset, tail)
    # _SYNTH_IMAGE_SIZING trains with use_fid=False (no proxy-FID-as-
    # validation); the TABLE still wants the test-time FID — re-enable it
    # for the test pass only (honestly stamped proxy when no weights).
    results = test_and_visualize(
        {**config, "use_fid": True}, run_dir, overwrite=True, test_fid=True
    )
    results["method"] = arm
    if nan:
        results["nan_during_training"] = True
    record_provenance(results)

    loaded = load_run(run_dir)
    x_test = np.asarray(loaded["trainer"].test_loader.x)
    summary = canonical_metric_summary(loaded["density"], loaded["variables"], x_test)
    for k, v in summary.items():
        results[f"canonical_{k}"] = v
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=4)
    return run_dir, results


def collect(runs_dir, datasets):
    """(dataset, method) -> [metrics dicts] from one or more runs dirs.

    ``runs_dir`` may be a single path or a list — the aggregation step merges
    e.g. the committed round-4 partial sweep (analysis/repro_synth_r04, same
    protocol: --synthetic --epochs 300) with the round-5 queue's runs."""
    rows = {}
    for rdir in [runs_dir] if isinstance(runs_dir, str) else runs_dir:
        for dataset in datasets:
            ddir = os.path.join(rdir, dataset)
            if not os.path.isdir(ddir):
                continue
            for run in sorted(os.listdir(ddir)):
                mpath = os.path.join(ddir, run, "metrics.json")
                if not os.path.exists(mpath):
                    continue
                with open(mpath) as f:
                    results = json.load(f)
                method = results.get("method")
                if method:
                    rows.setdefault((dataset, method), []).append(results)
    return rows


def _mean_stderr(vals):
    vals = np.asarray([v for v in vals if np.isfinite(v)], dtype=np.float64)
    if len(vals) == 0:
        return float("nan"), float("nan"), 0
    stderr = float(np.std(vals, ddof=1) / math.sqrt(len(vals))) if len(vals) > 1 else 0.0
    return float(np.mean(vals)), stderr, len(vals)


def render(rows, args):
    lines = ["## Tabular raw-feature Fréchet vs reference table",
             "(reference analysis/tabular_table.csv; 'filtered' applies the "
             "reference's FID>1.5 run drop)", "",
             "| dataset | method | ours (all) | ours (filtered) | reference | n | nan-runs |",
             "|---|---|---|---|---|---|---|"]
    for dataset in args.datasets:
        for lam in args.lambdas:
            method = method_name(lam)
            runs = rows.get((dataset, method), [])
            fids = [r.get("fid") for r in runs if r.get("fid") is not None]
            m_all, s_all, n = _mean_stderr(fids)
            m_f, s_f, _ = _mean_stderr([v for v in fids if v is not None and v <= 1.5])
            n_nan = sum(1 for r in runs if r.get("nan_during_training"))
            ref = BASELINE_TABULAR.get((dataset, lam))
            ref_s = f"{ref[0]:.3f} ± {ref[1]:.3f}" if ref else "—"
            lines.append(
                f"| {dataset} | {method} | {m_all:.3f} ± {s_all:.3f} | "
                f"{m_f:.3f} ± {s_f:.3f} | {ref_s} | {n} | {n_nan} |"
            )
    lines += ["", "## Image FID + MACS vs reference README.md:224-233", "",
              "| dataset | method | FID | MACS | reference MACS | n |",
              "|---|---|---|---|---|---|"]
    for dataset in args.image_datasets:
        for arm in ("RNF", "CMF"):
            runs = rows.get((dataset, arm), [])
            fid_m, fid_s, n = _mean_stderr(
                [r["fid"] for r in runs if r.get("fid") is not None]
            )
            macs_m, macs_s, _ = _mean_stderr(
                [r.get("canonical_macs") for r in runs if "canonical_macs" in r]
            )
            ref = BASELINE_MACS.get(dataset, {}).get(arm)
            extractors = sorted({r.get("fid.feature_extractor", r.get("feature_extractor", "?"))
                                 for r in runs})
            lines.append(
                f"| {dataset} | {arm} | {fid_m:.3f} ± {fid_s:.3f} "
                f"({','.join(str(e) for e in extractors)}) | "
                f"{macs_m:.4f} ± {macs_s:.4f} | {ref if ref is not None else '—'} | {n} |"
            )
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--inception-weights", default=None,
                    help=".npz (or .pth) of the pinned pt_inception weights")
    ap.add_argument("--synthetic", action="store_true",
                    help="run on the in-container synthetic fallbacks")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-dataset-size", type=int, default=None)
    ap.add_argument("--datasets", nargs="*", default=TAB_DATASETS)
    ap.add_argument("--image-datasets", nargs="*", default=IMG_DATASETS)
    ap.add_argument("--lambdas", nargs="*", type=float, default=LAMBDAS)
    ap.add_argument("--runs-dir", default="runs_repro")
    ap.add_argument("--extra-runs-dirs", nargs="*", default=[],
                    help="additional runs dirs merged at aggregation time "
                         "(e.g. analysis/repro_synth_r04 — same protocol)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--aggregate", action="store_true")
    ap.add_argument("--ci-small", action="store_true",
                    help="CI-only: shrink nets/batches so the synthetic "
                         "plumbing run fits a test budget — NOT the protocol")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    if args.inception_weights:
        os.environ["CMF_TPU_INCEPTION_WEIGHTS"] = args.inception_weights

    if not args.aggregate:
        for dataset in args.datasets:
            for lam in args.lambdas:
                for seed in range(args.seeds):
                    run_dir, results = run_tabular(dataset, lam, seed, args)
                    print(json.dumps({"dataset": dataset, "lambda": lam,
                                      "seed": seed, "run": run_dir,
                                      "fid": results.get("fid")}), flush=True)
        for dataset in args.image_datasets:
            for arm in ("RNF", "CMF"):
                for seed in range(args.seeds):
                    run_dir, results = run_image(dataset, arm, seed, args)
                    print(json.dumps({
                        "dataset": dataset, "method": arm, "seed": seed,
                        "run": run_dir, "fid": results.get("fid"),
                        "macs": results.get("canonical_macs")}), flush=True)

    all_datasets = list(args.datasets) + list(args.image_datasets)
    rows = collect([args.runs_dir] + list(args.extra_runs_dirs), all_datasets)
    md = render(rows, args)
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")
    return rows


if __name__ == "__main__":
    main()

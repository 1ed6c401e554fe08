#!/usr/bin/env python3
"""CMF-vs-RNF canonical-metric A/B battery — the paper's comparative claim.

The reference's headline scientific claim (README.md:213-235) is that the
off-diagonal metric regularizer (``g_ij_loss=True`` — the Canonical Manifold
Flow) drives the decoder metric toward canonical form relative to the plain
rectangular normalizing flow (RNF, regularizer off): lower MACS
(visualizer.py:2141-2144 cosine-similarity machinery) and variance
concentrated in fewer latent axes. The published numbers are MACS 0.03→0.02
(F-MNIST) and 0.04→0.03 (Omniglot).

This battery proves the DIRECTION of that claim in-container: for each
dataset it trains ``--seeds`` runs per arm {cmf: g_ij_loss=True,
rnf: g_ij_loss=False} through the public experiment API — nothing else
differs between arms — then measures on held-out test data:

  * MACS (mean absolute cosine similarity of decoder Jacobian columns),
  * diag-dominance of g = JᵀJ and the off-diagonal mass ratio,
  * cumulative-variance effective dimension (95% threshold), both
    latent-variance- and g_kk-weighted,
  * the per-dataset analytic oracles (sinusoid z-marginal KL, hemisphere
    radius MAE) as convergence evidence that BOTH arms actually fit the
    manifold (a MACS win on a divergent run would be meaningless).

Datasets (per round-3 verdict item 1): sinusoid-1-6 and hemisphere-2-6 at
the published sinusoid protocol (README.md:62-70; no published hemisphere
command — sphere-like lr), plus a synthetic-image mnist config at
latent_dimension=10 (CMF_TPU-native synthetic data; the container has no
real MNIST).

Usage:
    python analysis/ab_battery.py [--seeds 5] [--runs-dir runs_ab]
        [--datasets ...] [--out RESULTS_AB.md]
    python analysis/ab_battery.py --pairs mnist:cmf:0 mnist:rnf:0 ...  # lane
    python analysis/ab_battery.py --aggregate                          # table
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import (  # noqa: E402
    _setup_compile_cache,
    radius_w1,
    record_provenance,
    sinusoid_z_kl,
)

ARMS = {"cmf": {"g_ij_loss": True}, "rnf": {"g_ij_loss": False}}

PROTOCOL = {
    # README.md:62-70 sinusoid-1-6 protocol (supported subset; the README's
    # g_ij_global_loss / centering_loss flags exist nowhere in the reference
    # CODE — they are vestigial README text, see tests/test_schema_parity.py).
    "sinusoid-1-6": {
        "lr": 0.0007,
        "likelihood_warmup": False,
        "latent_dimension": 6,
    },
    "hemisphere-2-6": {"lr": 0.001, "latent_dimension": 6},
    # Synthetic-image arm: mnist non-square at d=10 on the in-container
    # synthetic data. 1500 images / batch 50 = 30 steps/epoch; the warmup
    # schedule is absolute (15→30 of 45 epochs): 450 reconstruction-only
    # steps, a 450-step ramp, then 15 epochs at full likelihood+metric
    # weight. The exact path runs ~300 ms/step on the v5e (d=10 conv-decode
    # column fan-out), so the arm is sized to ~8 min/run.
    "mnist": {
        # Exact Gram path: the g_ij loss NEEDS the full JᵀJ (this framework
        # asserts rather than reproducing the reference's accidental
        # broadcast of the (B,d,1) hutchinson probe against a (d,d) mask,
        # ref non_square.py:95-99 — which silently penalizes |JᵀJε|, not the
        # off-diagonal Gram). d=10 keeps the d-column conv fan-out affordable.
        "log_jacobian_method": "cholesky",
        "latent_dimension": 10,
        "synthetic_data": True,
        "max_dataset_size": 1500,
        "g_hidden_channels": [64] * 4,
        "prior_hidden_channels": [32] * 4,
        "use_fid": False,
        # Image non-square valid/test loss is hardcoded 0 (the reference uses
        # FID there, experiment.py:211-214) — early stopping would freeze
        # best_valid at the FIRST validation epoch and load_run would measure
        # that mid-ramp state. Train the fixed schedule and measure `latest`.
        "early_stopping": False,
        "max_epochs": 45,
        "likelihood_warmup_start": 15,
        "likelihood_warmup_end": 30,
        "epochs_per_test": 60,
    },
}

ORACLES = {
    "sinusoid-1-6": {"sinusoid_z_kl": lambda d, v: sinusoid_z_kl(d, v)},
    "hemisphere-2-6": {"radius_w1": lambda d, v: radius_w1(d, v, "hemisphere-2-6")},
}

CANONICAL_KEYS = (
    "macs",
    "g_diag_dominance",
    "g_offdiag_ratio",
    "effective_dim_variance",
    "effective_dim_gkk",
)


def run_one(dataset, arm, seed, runs_dir):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import load_run, test_and_visualize, train
    from cmf_tpu.viz.metric_analysis import canonical_metric_summary

    config = get_config(dataset, "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": dataset, **config}
    config.update(PROTOCOL.get(dataset, {}))
    config.update(ARMS[arm])
    config = expand_grid(config)[0]
    config["seed"] = seed
    config["logdir_root"] = runs_dir
    config["rundir_tail"] = f"_{arm}_seed{seed}"

    setup = train(config)
    run_dir = setup["writer"].logdir
    results = test_and_visualize(config, run_dir, overwrite=True)
    results["arm"] = arm
    record_provenance(results)

    loaded = load_run(run_dir)
    density, variables = loaded["density"], loaded["variables"]
    x_test = np.asarray(loaded["trainer"].test_loader.x)
    summary = canonical_metric_summary(density, variables, x_test)
    for k, v in summary.items():
        results[f"canonical_{k}"] = v
    for name, fn in ORACLES.get(dataset, {}).items():
        results[name] = fn(density, variables)
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=4)
    return run_dir, results


def _flatten(results):
    keep = tuple(f"canonical_{k}" for k in CANONICAL_KEYS) + (
        "loss",
        "elbo",
        "reconstruction-error",
        "sinusoid_z_kl",
        "radius_w1",
    )
    return {
        k: float(v)
        for k, v in results.items()
        if isinstance(v, (int, float, np.floating, np.integer))
        and not isinstance(v, bool)
        and any(s in k for s in keep)
    }


def collect(runs_dir, datasets):
    """(dataset, arm) -> list of flattened metrics dicts, from run dirs.
    Each dict carries "seed" (parsed from the run-dir tail) for pairing."""
    rows = {}
    for dataset in datasets:
        ddir = os.path.join(runs_dir, dataset)
        if not os.path.isdir(ddir):
            continue
        for run in sorted(os.listdir(ddir)):
            run_dir = os.path.join(ddir, run)
            mpath = os.path.join(run_dir, "metrics.json")
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                results = json.load(f)
            arm = results.get("arm")
            if arm is None:  # fall back to the run's own config
                with open(os.path.join(run_dir, "config.json")) as f:
                    arm = "cmf" if json.load(f).get("g_ij_loss") else "rnf"
            flat = _flatten(results)
            if "_seed" in run:
                flat["seed"] = int(run.rsplit("_seed", 1)[1])
            rows.setdefault((dataset, arm), []).append(flat)
    return rows


def paired_macs_test(rows, dataset):
    """Per-seed paired comparison of MACS: (n_lower, n_pairs, paired t).
    With identical seeds per arm, pairing removes the init/data variance —
    the sharpest in-container statement of the paper's direction claim."""
    cmf = {r.get("seed"): r for r in rows.get((dataset, "cmf"), []) if "seed" in r}
    rnf = {r.get("seed"): r for r in rows.get((dataset, "rnf"), []) if "seed" in r}
    deltas = [
        cmf[s]["canonical_macs"] - rnf[s]["canonical_macs"]
        for s in sorted(set(cmf) & set(rnf))
        if "canonical_macs" in cmf[s] and "canonical_macs" in rnf[s]
    ]
    if len(deltas) < 2:
        return None
    d = np.asarray(deltas, dtype=np.float64)
    t = float(d.mean() / (d.std(ddof=1) / math.sqrt(len(d)) + 1e-30))
    return {"n_lower": int(np.sum(d < 0)), "n_pairs": len(d), "paired_t": t,
            "mean_delta": float(d.mean())}


def aggregate(rows):
    out = {}
    keys = sorted(set().union(*[set(r) for r in rows])) if rows else []
    keys = [k for k in keys if k != "seed"]
    for k in keys:
        vals = np.array([r[k] for r in rows if k in r and np.isfinite(r.get(k, np.nan))])
        if len(vals) == 0:
            continue
        stderr = float(np.std(vals, ddof=1) / math.sqrt(len(vals))) if len(vals) > 1 else 0.0
        out[k] = (float(np.mean(vals)), stderr, len(vals))
    return out


def render(rows, datasets):
    """Side-by-side CMF/RNF table + per-metric deltas."""
    lines = [
        "| dataset | metric | CMF (g_ij on) | RNF (off) | Δ (cmf−rnf) | n |",
        "|---|---|---|---|---|---|",
    ]
    verdicts = []
    for dataset in datasets:
        cmf = aggregate(rows.get((dataset, "cmf"), []))
        rnf = aggregate(rows.get((dataset, "rnf"), []))
        for metric in sorted(set(cmf) | set(rnf)):
            cm, cs, cn = cmf.get(metric, (float("nan"), 0.0, 0))
            rm, rs, rn = rnf.get(metric, (float("nan"), 0.0, 0))
            lines.append(
                f"| {dataset} | {metric} | {cm:.4f} ± {cs:.4f} | "
                f"{rm:.4f} ± {rs:.4f} | {cm - rm:+.4f} | {min(cn, rn)} |"
            )
        if "canonical_macs" in cmf and "canonical_macs" in rnf:
            cm, cs, _ = cmf["canonical_macs"]
            rm, rs, _ = rnf["canonical_macs"]
            direction = "LOWER (matches README.md:224-233)" if cm < rm else "NOT lower"
            paired = paired_macs_test(rows, dataset)
            paired_s = (
                f" — paired per-seed: {paired['n_lower']}/{paired['n_pairs']} "
                f"seeds lower, t={paired['paired_t']:.2f}"
                if paired else ""
            )
            verdicts.append(
                f"- **{dataset}**: MACS(cmf)={cm:.4f}±{cs:.4f} vs "
                f"MACS(rnf)={rm:.4f}±{rs:.4f} → CMF {direction}{paired_s}"
            )
    return "\n".join(lines), "\n".join(verdicts)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--datasets", nargs="+",
                    default=["sinusoid-1-6", "hemisphere-2-6", "mnist"])
    ap.add_argument("--runs-dir", default="runs_ab")
    ap.add_argument("--out", default=None, help="markdown output path")
    ap.add_argument("--pairs", nargs="+", default=None,
                    help="dataset:arm:seed entries (lane mode: train only)")
    ap.add_argument("--aggregate", action="store_true",
                    help="skip training; build the table from --runs-dir")
    ap.add_argument("--reoracle", action="store_true",
                    help="recompute ORACLES for existing runs, patch "
                         "metrics.json, then aggregate")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    if args.reoracle:
        from cmf_tpu.training import load_run

        for dataset in args.datasets:
            ddir = os.path.join(args.runs_dir, dataset)
            if not os.path.isdir(ddir) or dataset not in ORACLES:
                continue
            for run in sorted(os.listdir(ddir)):
                run_dir = os.path.join(ddir, run)
                mpath = os.path.join(run_dir, "metrics.json")
                if not os.path.exists(mpath):
                    continue
                with open(mpath) as f:
                    results = json.load(f)
                loaded = load_run(run_dir)
                for name, fn in ORACLES[dataset].items():
                    results[name] = fn(loaded["density"], loaded["variables"])
                with open(mpath, "w") as f:
                    json.dump(results, f, indent=4)
                print(json.dumps({"run": run_dir,
                                  **{k: results[k] for k in ORACLES[dataset]}}),
                      flush=True)
        args.aggregate = True

    if args.pairs:
        import glob

        for pair in args.pairs:
            dataset, arm, seed = pair.rsplit(":", 2)
            done = [
                p
                for p in glob.glob(
                    os.path.join(args.runs_dir, dataset, f"*_{arm}_seed{seed}")
                )
                if os.path.exists(os.path.join(p, "metrics.json"))
            ]
            if done:  # idempotent lanes: a retry skips finished pairs
                print(json.dumps({"dataset": dataset, "arm": arm,
                                  "seed": int(seed), "skipped": done[0]}),
                      flush=True)
                continue
            run_dir, results = run_one(dataset, arm, int(seed), args.runs_dir)
            print(json.dumps({"dataset": dataset, "arm": arm, "seed": int(seed),
                              "run": run_dir, **_flatten(results)}), flush=True)
        return

    if not args.aggregate:
        for dataset in args.datasets:
            for arm in ARMS:
                for seed in range(args.seeds):
                    run_dir, results = run_one(dataset, arm, seed, args.runs_dir)
                    print(json.dumps({"dataset": dataset, "arm": arm,
                                      "seed": seed, "run": run_dir,
                                      **_flatten(results)}), flush=True)

    rows = collect(args.runs_dir, args.datasets)
    table, verdicts = render(rows, args.datasets)
    md = table + "\n\n### MACS direction check\n\n" + verdicts
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Hemisphere-2-6 Appendix-F.1-style protocol grid (round-4 verdict weak #2).

The round-4 battery's hemisphere anchors are weakly converged: radius W1
0.71-0.86 against a data radius spread of 0.10, and the round-4 probe showed
reg=50+warmup nails the manifold (W1 0.005-0.010) at catastrophic elbo cost —
the transferred reg=1 protocol sits at the elbo-favoring extreme of a genuine
manifold-vs-likelihood trade-off. The reference publishes no hemisphere
command; its practice is a grid search over regularization / warmup / lr
(reference README.md:63-73). This script runs that grid:

    regularization_param ∈ {1, 10, 50} × likelihood_warmup {off, on}
        × lr ∈ {1e-3, 5e-4},  --cell-seeds seeds per cell,

selects the winning cell by the combined criterion (radius W1 < --w1-gate
with the lowest test −elbo; if no cell gates, the frontier itself is the
result), then anchors the winner with --final-seeds seeds.

Metrics per run: radius_w1 (data-anchored W1 of the sample-radius law,
two_d_battery.radius_w1), test loss = pure −elbo with regularizers off
(experiment.py:605-606 semantics).

Usage:
    python analysis/hemisphere_grid.py --runs-dir runs_hemi_grid \
        [--cell-seeds 2] [--final-seeds 5] [--epochs 2000] \
        [--out HEMISPHERE_GRID_r5.md]
"""

import argparse
import itertools
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, run_one  # noqa: E402

DATASET = "hemisphere-2-6"

REGS = [1, 10, 50]
WARMUPS = [False, True]
LRS = [1e-3, 5e-4]


def cell_overrides(reg, warmup, lr, epochs):
    ov = {
        "g_ij_loss": True,
        "latent_dimension": 6,
        "regularization_param": reg,
        "lr": lr,
        "likelihood_warmup": warmup,
        "max_epochs": epochs,
    }
    if warmup:
        # Reconstruction-only epochs lock the chart onto the manifold before
        # likelihood introduction (the tabular defense, ref tabular.py:
        # 298-354) — scaled to leave most of the budget post-warmup.
        ov["likelihood_warmup_start"] = max(1, epochs // 10)
        ov["likelihood_warmup_end"] = max(2, epochs // 4)
    return ov


def cell_tag(reg, warmup, lr):
    return f"reg{reg}_wu{'on' if warmup else 'off'}_lr{lr:g}"


def run_cell(reg, warmup, lr, seed, args):
    tag = cell_tag(reg, warmup, lr)
    run_dir, results = run_one(
        DATASET, seed, None, args.runs_dir,
        overrides=cell_overrides(reg, warmup, lr, args.epochs),
        tail=f"_{tag}_seed{seed}",
    )
    rec = {
        "cell": tag, "reg": reg, "warmup": warmup, "lr": lr, "seed": seed,
        "run": run_dir,
        "radius_w1": results.get("radius_w1"),
        "neg_elbo": results.get("loss"),
    }
    print(json.dumps(rec), flush=True)
    return rec


def _mean_stderr(vals):
    vals = np.asarray([v for v in vals if v is not None and np.isfinite(v)],
                      dtype=np.float64)
    if len(vals) == 0:
        return float("nan"), float("nan"), 0
    se = float(np.std(vals, ddof=1) / math.sqrt(len(vals))) if len(vals) > 1 else 0.0
    return float(np.mean(vals)), se, len(vals)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs-dir", default="runs_hemi_grid")
    ap.add_argument("--cell-seeds", type=int, default=2)
    ap.add_argument("--final-seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--w1-gate", type=float, default=0.1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--state", default=None,
                    help="jsonl of completed runs (resume / reaggregate)")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    state_path = args.state or os.path.join(args.runs_dir, "grid_state.jsonl")
    os.makedirs(args.runs_dir, exist_ok=True)
    done = []
    if os.path.exists(state_path):
        with open(state_path) as f:
            done = [json.loads(ln) for ln in f if ln.strip()]
    seen = {(r["cell"], r["seed"]) for r in done}

    def record(rec):
        done.append(rec)
        with open(state_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # Phase 1: the grid.
    for reg, warmup, lr in itertools.product(REGS, WARMUPS, LRS):
        for seed in range(args.cell_seeds):
            if (cell_tag(reg, warmup, lr), seed) in seen:
                continue
            record(run_cell(reg, warmup, lr, seed, args))

    # Select: among gated cells (mean W1 < gate), the lowest mean −elbo;
    # tie-break / no-gate fallback: lowest W1.
    cells = {}
    for r in done:
        cells.setdefault(r["cell"], []).append(r)
    summary = []
    for tag, recs in cells.items():
        w1_m, w1_se, n = _mean_stderr([r["radius_w1"] for r in recs])
        el_m, el_se, _ = _mean_stderr([r["neg_elbo"] for r in recs])
        n_finite = sum(1 for r in recs
                       if r["neg_elbo"] is not None and np.isfinite(r["neg_elbo"]))
        summary.append({
            "cell": tag, "reg": recs[0]["reg"], "warmup": recs[0]["warmup"],
            "lr": recs[0]["lr"], "radius_w1": w1_m, "radius_w1_se": w1_se,
            "neg_elbo": el_m, "neg_elbo_se": el_se, "n": n,
            "n_finite_elbo": n_finite,
        })
    gated = [s for s in summary
             if np.isfinite(s["radius_w1"]) and s["radius_w1"] < args.w1_gate
             and np.isfinite(s["neg_elbo"])]
    if gated:
        winner = min(gated, key=lambda s: s["neg_elbo"])
    else:
        winner = min(summary, key=lambda s: (not np.isfinite(s["radius_w1"]),
                                             s["radius_w1"]))

    # Phase 2: anchor the winner with final_seeds seeds.
    for seed in range(args.final_seeds):
        if (winner["cell"], seed) in {(r["cell"], r["seed"]) for r in done}:
            continue
        record(run_cell(winner["reg"], winner["warmup"], winner["lr"], seed, args))

    win_recs = [r for r in done if r["cell"] == winner["cell"]]
    w1_m, w1_se, n = _mean_stderr([r["radius_w1"] for r in win_recs])
    el_m, el_se, _ = _mean_stderr([r["neg_elbo"] for r in win_recs])

    lines = [
        f"## hemisphere-2-6 protocol grid ({args.epochs} epochs, "
        f"{args.cell_seeds} seeds/cell, winner at {args.final_seeds} seeds)",
        "",
        "| cell | reg | warmup | lr | radius W1 | test −elbo | n |",
        "|---|---|---|---|---|---|---|",
    ]
    for s in sorted(summary, key=lambda s: s["radius_w1"]):
        mark = " **(winner)**" if s["cell"] == winner["cell"] else ""
        lines.append(
            f"| {s['cell']}{mark} | {s['reg']} | {'on' if s['warmup'] else 'off'} "
            f"| {s['lr']:g} | {s['radius_w1']:.4f} ± {s['radius_w1_se']:.4f} "
            f"| {s['neg_elbo']:.2f} ± {s['neg_elbo_se']:.2f} | {s['n']} |"
        )
    lines += [
        "",
        f"Winner `{winner['cell']}` at {n} seeds: radius W1 "
        f"**{w1_m:.4f} ± {w1_se:.4f}**, test −elbo **{el_m:.2f} ± {el_se:.2f}**.",
        f"Gate: radius W1 < {args.w1_gate} with finite elbo → "
        + ("**met**" if (np.isfinite(w1_m) and w1_m < args.w1_gate
                         and np.isfinite(el_m)) else
           "**not met** — the measured frontier excludes that region; see rows"),
    ]
    md = "\n".join(lines)
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")
    return summary, winner


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Hemisphere latent-dimension supplement to the protocol grid.

The reg × warmup × lr grid (analysis/hemisphere_grid.py) comes out starkly
bimodal at the transferred latent_dimension=6 protocol: warmup-off runs sit
at −elbo ≈ 6 with radius-W1 ≈ 1 (density good, manifold ignored), warmup-on
runs at W1 ≈ 0.01-0.03 with −elbo ≈ 6-12k (manifold nailed, density
destroyed). A plausible mechanism: at latent 6 = ambient 6 the chart is
SQUARE; once warmup locks it onto the 2-D manifold, ~4 Jacobian directions
collapse and the log|JᵀJ| term in the likelihood diverges — the density on
the manifold can never recover. A d=3 chart (one noise dim above intrinsic
2, sinusoid-style) cannot collapse that way.

This probe runs latent_dimension ∈ {3, 6} × warmup {on, off} at reg 10 /
lr 1e-3 (2 seeds) to test that mechanism and look for a cell with BOTH
W1 < 0.1 and a sane elbo.

Usage: python analysis/hemisphere_latent_probe.py [--runs-dir runs_hemi_lat]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, run_one  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs-dir", default="runs_hemi_lat")
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    _setup_compile_cache()

    rows = []
    for latent, warmup in itertools.product((3, 6), (True, False)):
        for seed in range(args.seeds):
            ov = {
                "g_ij_loss": latent > 1,
                "latent_dimension": latent,
                "regularization_param": 10,
                "lr": 1e-3,
                "likelihood_warmup": warmup,
                "max_epochs": args.epochs,
            }
            if warmup:
                ov["likelihood_warmup_start"] = args.epochs // 10
                ov["likelihood_warmup_end"] = args.epochs // 4
            tag = f"lat{latent}_wu{'on' if warmup else 'off'}"
            run_dir, results = run_one(
                "hemisphere-2-6", seed, None, args.runs_dir,
                overrides=ov, tail=f"_{tag}_seed{seed}",
            )
            rec = {"cell": tag, "latent": latent, "warmup": warmup,
                   "seed": seed, "run": run_dir,
                   "radius_w1": results.get("radius_w1"),
                   "neg_elbo": results.get("loss")}
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()

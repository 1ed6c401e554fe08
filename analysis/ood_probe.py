#!/usr/bin/env python3
"""OOD classification rates at convergence (round-4 verdict missing #2).

The reference's OOD experiment ends in NUMBERS: depth-1 decision stumps on
per-example likelihood and reconstruction-error, printed as classification
rates for an in/out dataset pair (ref experiment.py:278-313), fed by 4
ood passes ({in,out} × {train,test}, ref experiment.py:236-275). The repo
had the full pipeline but only a 1-epoch plumbing test. This probe runs the
experiment to a RESULT on converged models:

    for each direction (mnist→fashion-mnist, fashion-mnist→mnist):
        take a CONVERGED non-square run (e.g. a runs_repro_r5 image-arm
        run: d=10, exact Gram, 45 epochs, synthetic data), run
        generate_ood_metrics + ood_classification, record the rates.

Artifacts: the four ood_metrics_*.npy per run (left in the run dir and
copied to --out-dir), per-dataset summary jsons, and OOD_r5.json with the
stump rates + the likelihood-vs-reconstruction comparison (the RNF-paper
finding is that reconstruction-error separates better).

Usage:
    python analysis/ood_probe.py --mnist-run <dir> --fashion-run <dir> \
        [--out-dir analysis/ood_r5]
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, record_provenance  # noqa: E402


def run_direction(run_dir, out_dir):
    from cmf_tpu.training.experiment import generate_ood_metrics, ood_classification

    with open(os.path.join(run_dir, "config.json")) as f:
        config = json.load(f)
    in_ds = config["dataset"]
    generate_ood_metrics(config, run_dir)
    rates = ood_classification(run_dir)
    rec = {
        "run": run_dir,
        "in_dataset": in_ds,
        "rates": rates,
        "recon_beats_likelihood": {
            split: rates[f"{split}/reconstruction-error"] > rates[f"{split}/likelihood"]
            for split in ("train", "test")
        },
    }
    record_provenance(rec)
    # copy the per-example feature dumps + summaries as committed evidence
    dest = os.path.join(out_dir, in_ds.replace("/", "_"))
    os.makedirs(dest, exist_ok=True)
    for name in os.listdir(run_dir):
        if name.startswith("ood_metrics") and name.endswith((".npy", ".json")):
            shutil.copy2(os.path.join(run_dir, name), os.path.join(dest, name))
    for name in ("config.json",):
        shutil.copy2(os.path.join(run_dir, name), os.path.join(dest, name))
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mnist-run", required=True)
    ap.add_argument("--fashion-run", required=True)
    ap.add_argument("--out-dir", default="analysis/ood_r5")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    os.makedirs(args.out_dir, exist_ok=True)
    results = {
        "mnist_to_fashion": run_direction(args.mnist_run, args.out_dir),
        "fashion_to_mnist": run_direction(args.fashion_run, args.out_dir),
    }
    with open(os.path.join(args.out_dir, "OOD_r5.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()

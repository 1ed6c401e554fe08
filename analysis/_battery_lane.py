#!/usr/bin/env python3
"""Battery lane driver: run an explicit (dataset, seed) list through
two_d_battery.run_one so the 5x5 battery can be split across the TPU and CPU
backends concurrently (one process per backend; the axon relay allows only one
TPU client). Emits one JSON line per finished run.

Usage: python analysis/_battery_lane.py --runs-dir runs_battery \
           --pairs sphere:0 sphere:1 fuzzy-line:0 ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache, run_one  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--pairs", nargs="+", required=True,
                    help="dataset:seed entries, run in order")
    args = ap.parse_args()
    _setup_compile_cache()
    for pair in args.pairs:
        dataset, seed = pair.rsplit(":", 1)
        run_dir, results = run_one(dataset, int(seed), args.epochs, args.runs_dir)
        import numpy as np

        # np.floating/np.integer are not Python float/int subclasses, and bool
        # IS an int subclass — filter accordingly (round-3 advisor finding).
        flat = {
            k: float(v)
            for k, v in results.items()
            if isinstance(v, (int, float, np.floating, np.integer))
            and not isinstance(v, bool)
        }
        print(json.dumps({"dataset": dataset, "seed": int(seed),
                          "run": run_dir, **flat}), flush=True)


if __name__ == "__main__":
    main()

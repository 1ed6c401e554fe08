#!/usr/bin/env python3
"""Shared-queue lane driver for the reproduction sweep (round 5).

The full synthetic reproduction grid (4 tabular datasets x 4 lambda arms x
5 seeds + the image RNF/CMF arms) is ~80 training runs — more than either
backend can finish alone in a round. This driver lets the TPU process and a
CPU process drain ONE work queue concurrently: tasks are claimed atomically
via ``os.mkdir`` in a claims directory (mkdir is atomic on POSIX), so two
lanes never run the same task and the faster lane naturally takes more work.

Queue file format (one task per line, '#' comments allowed):
    tab:<dataset>:<lambda>:<seed>
    img:<dataset>:<RNF|CMF>:<seed>

Usage (TPU lane):
    PYTHONPATH=/root/repo python analysis/_repro_lane.py \
        --queue q.txt --runs-dir runs_repro_r5 --tab-epochs 300
CPU lane: same command under
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import _setup_compile_cache  # noqa: E402


class _Args:
    """Namespace matching what reproduce_tables.run_tabular/run_image read."""

    def __init__(self, runs_dir, epochs, synthetic=True):
        self.runs_dir = runs_dir
        self.epochs = epochs
        self.synthetic = synthetic
        self.data_root = None
        self.max_dataset_size = None
        self.ci_small = False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queue", required=True)
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--tab-epochs", type=int, default=300)
    ap.add_argument("--claims-dir", default=None)
    ap.add_argument("--only", choices=["tab", "img"], default=None,
                    help="restrict this lane to one task kind (e.g. keep "
                         "conv-heavy image runs off the CPU lane)")
    ap.add_argument("--max-tasks", type=int, default=None,
                    help="exit cleanly after claiming this many tasks — lets "
                         "a lane run in bounded chunks so the TPU can be "
                         "handed to interlude jobs between chunks (killed "
                         "TPU clients can wedge the relay)")
    args = ap.parse_args()
    _setup_compile_cache()

    claims = args.claims_dir or (args.queue + ".claims")
    os.makedirs(claims, exist_ok=True)

    from analysis.reproduce_tables import run_image, run_tabular

    with open(args.queue) as f:
        tasks = [ln.strip() for ln in f
                 if ln.strip() and not ln.strip().startswith("#")]

    n_claimed = 0
    for task in tasks:
        if args.only and not task.startswith(args.only + ":"):
            continue
        if args.max_tasks is not None and n_claimed >= args.max_tasks:
            print(json.dumps({"lane_exit": "max_tasks", "claimed": n_claimed}),
                  flush=True)
            break
        tid = task.replace(":", "_").replace(".", "p")
        try:
            os.mkdir(os.path.join(claims, tid))  # atomic claim
        except FileExistsError:
            continue
        n_claimed += 1
        t0 = time.time()
        try:
            kind, dataset, mid, seed = task.split(":")
            seed = int(seed)
            if kind == "tab":
                lam = float(mid)
                run_dir, results = run_tabular(
                    dataset, lam, seed, _Args(args.runs_dir, args.tab_epochs)
                )
                rec = {"task": task, "run": run_dir, "fid": results.get("fid"),
                       "backend": results.get("backend")}
            else:
                run_dir, results = run_image(
                    dataset, mid, seed, _Args(args.runs_dir, epochs=None)
                )
                rec = {"task": task, "run": run_dir, "fid": results.get("fid"),
                       "macs": results.get("canonical_macs"),
                       "backend": results.get("backend")}
            rec["minutes"] = round((time.time() - t0) / 60, 2)
            print(json.dumps(rec), flush=True)
            with open(os.path.join(claims, tid, "done"), "w") as f:
                json.dump(rec, f)
        except Exception:
            traceback.print_exc()
            with open(os.path.join(claims, tid, "failed"), "w") as f:
                f.write(traceback.format_exc())
            print(json.dumps({"task": task, "error": True}), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Re-test runs and build the RNF-vs-CMF tabular table
(reference analysis/tabular_evaluate.py:25-115): for each run dir without
metrics.json, run test_and_visualize, then aggregate FID-like values
keyed by (dataset, metric_regularization_param)."""
import argparse, json, os
from cmf_tpu.analysis import scan_runs, aggregate, write_csv

p = argparse.ArgumentParser()
p.add_argument("--runs", default="runs")
p.add_argument("--out", default="tabular_table.csv")
p.add_argument("--retest", action="store_true", help="Run test on runs missing metrics.json")
a = p.parse_args()

if a.retest:
    from cmf_tpu.training import test_and_visualize
    for run_dir, config, metrics in list(scan_runs(a.runs, require_metrics=False)):
        if metrics is None:
            print(f"re-testing {run_dir}")
            test_and_visualize(config, run_dir)

key_fields = ("dataset", "metric_regularization_param")
rows = aggregate(scan_runs(a.runs), key_fields, "fid")
write_csv(rows, a.out, key_fields, label="fid")
for r in rows:
    print(r)
print(f"wrote {a.out}")

#!/usr/bin/env python3
"""Reconstruction-vs-effective-d aggregation
(reference analysis/collect_test_metric.py:100-130): scans per-run
metric_analysis json dumps and tabulates cumulative-variance/effective-d."""
import argparse, glob, json, os
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--runs", default="runs")
p.add_argument("--threshold", type=float, default=0.95, help="Cumulative variance threshold for effective d")
a = p.parse_args()

rows = []
for path in glob.glob(os.path.join(a.runs, "**", "metric_analysis_epoch*.json"), recursive=True):
    with open(path) as f:
        d = json.load(f)
    cum = np.array(d.get("cumulative_variance", []))
    eff_d = int(np.searchsorted(cum, a.threshold) + 1) if len(cum) else None
    rows.append({"path": path, "effective_d": eff_d, "macs": d.get("macs")})
    print(rows[-1])
if not rows:
    print("no metric_analysis dumps found")

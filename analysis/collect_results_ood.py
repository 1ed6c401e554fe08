#!/usr/bin/env python3
"""OOD tables over runs/ (reference analysis/collect_results_ood.py:16-60)."""
import argparse
from cmf_tpu.analysis import collect_ood

p = argparse.ArgumentParser()
p.add_argument("--runs", default="runs")
p.add_argument("--out", default="ood_table.csv")
a = p.parse_args()
for r in collect_ood(a.runs, out_csv=a.out):
    print(r)
print(f"wrote {a.out}")

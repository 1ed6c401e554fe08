#!/usr/bin/env python3
"""FID table over runs/ (reference analysis/collect_results_fid.py:50-122)."""
import argparse
from cmf_tpu.analysis import collect_fid

p = argparse.ArgumentParser()
p.add_argument("--runs", default="runs")
p.add_argument("--out", default="fid_table.csv")
a = p.parse_args()
rows = collect_fid(a.runs, out_csv=a.out)
for r in rows:
    print(r)
print(f"wrote {a.out}")

#!/usr/bin/env python3
"""Effective-z FID plot over runs/
(reference analysis/collect_effective_z_fid_plot.py): one curve per λ of
FID-vs-effective-d, from per-run test_metric/fid.json dumps (written by the
metric visualizer battery, --test-metric)."""
import argparse
import os

from cmf_tpu.analysis import effective_z_plot

p = argparse.ArgumentParser()
p.add_argument("-d", "--dir", default="runs", help="Location of runs directory")
p.add_argument("--datasets", nargs="*", default=None)
p.add_argument("--dims", nargs="*", type=int, default=None)
p.add_argument("--lambdas", nargs="*", type=float, default=None)
p.add_argument("--out", default="results_tables/fid_vs_dim_effective_z.pdf")
a = p.parse_args()

os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
curves = effective_z_plot(a.dir, "fid", a.out, a.datasets, a.dims, a.lambdas)
for lam, curve in sorted(curves.items(), key=lambda kv: str(kv[0])):
    print(lam, curve)
print(f"wrote {a.out}" if curves else "no test_metric/fid.json dumps found")

#!/usr/bin/env python3
"""FID vs latent-dim plot (reference analysis/collect_results_fid_dimplot.py)."""
import argparse
from cmf_tpu.analysis import fid_vs_dim_plot

p = argparse.ArgumentParser()
p.add_argument("--runs", default="runs")
p.add_argument("--out", default="fid_vs_dim.pdf")
a = p.parse_args()
print("wrote", fid_vs_dim_plot(a.runs, a.out))

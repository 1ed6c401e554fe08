#!/usr/bin/env python3
"""Drive metric_test_plots over every run dir
(reference analysis/metric_evaluate.py): loads each run's config.json and
runs the metric visualizer battery, writing test_metric/ artifacts in-place."""
import argparse
import glob
import json
import os

from cmf_tpu.training import metric_test_plots

p = argparse.ArgumentParser()
p.add_argument("-d", "--dir", default="runs/metric_test", help="Location of runs directory")
a = p.parse_args()

for run in sorted(glob.glob(os.path.join(a.dir, "*"))):
    try:
        with open(os.path.join(run, "config.json")) as f:
            config = json.load(f)
    except FileNotFoundError:
        print(f"Skipping {run} because no config")
        continue
    print(f"metric_test_plots: {run} ({config['dataset']})")
    metric_test_plots(config, run)
